"""Numerically stable binomial log-pmf primitives.

The chain-binomial likelihood (reference: gemlib
``DiscreteTimeStateTransitionModel.log_prob``, spec in
``/root/reference/doc/lancs_space_model_concept.tex:248-279``) evaluates
``Binomial(n=source_state, p=1-exp(-rate*dt)).log_prob(y)`` where ``n`` can be
of order 1e6 (LAD population) while ``y`` is of order 1e0-1e3.  A direct
``lgamma(n+1) - lgamma(n-k+1)`` in float32 suffers catastrophic cancellation
(both terms ~1e7 with float32 ulp ~1), so we evaluate the difference through a
Stirling expansion recombined analytically into cancellation-free terms.  This
is what makes the whole likelihood float32-safe on TPU, where float64 is
emulated and slow.
"""

import jax.numpy as jnp
from jax import lax

_LOG_2PI = 1.8378770664093453

# Threshold on n-k+1 above which the Stirling form is used.  With two
# correction terms the Stirling error at z=10 is ~1/(1260 z^5) ~ 8e-9,
# far below float32 round-off of the direct form there.
_STIRLING_THRESHOLD = 10.0


def lgamma_diff(n, k):
    """Computes ``lgamma(n+1) - lgamma(n-k+1)`` stably.

    Uses direct lgamma for small ``n-k+1`` and an analytically recombined
    Stirling expansion for large ``n-k+1``:

        diff = (a-1/2)*log1p(k/b) + k*log(b) - k
               + (1/12)(1/a - 1/b) - (1/360)(1/a^3 - 1/b^3)

    with ``a = n+1``, ``b = n-k+1``.  Every term is well-conditioned: the
    big cancelling parts of the two lgammas have been cancelled on paper.

    Args:
      n: trial counts (float array), n >= 0.
      k: success counts (float array), 0 <= k <= n.  Values outside this
         range produce garbage; callers mask them.

    Returns:
      ``lgamma(n+1) - lgamma(n-k+1)`` elementwise.
    """
    dtype = jnp.result_type(n, k)
    n = jnp.asarray(n, dtype)
    k = jnp.asarray(k, dtype)
    a = n + 1.0
    b = n - k + 1.0
    # Clamp so both branches of the `where` are NaN-free (grad-safe).
    b_safe = jnp.maximum(b, 0.5)
    a_safe = jnp.maximum(a, 0.5)
    direct = lax.lgamma(a_safe) - lax.lgamma(b_safe)
    log_ab = jnp.log1p(k / b_safe)
    stirling = (
        (a_safe - 0.5) * log_ab
        + k * jnp.log(b_safe)
        - k
        + (1.0 / 12.0) * (1.0 / a_safe - 1.0 / b_safe)
        - (1.0 / 360.0) * (1.0 / a_safe**3 - 1.0 / b_safe**3)
    )
    return jnp.where(b > _STIRLING_THRESHOLD, stirling, direct)


def log_choose(n, k):
    """Stable ``log C(n, k)`` for float counts; caller masks invalid (k<0, k>n)."""
    dtype = jnp.result_type(n, k)
    k = jnp.asarray(k, dtype)
    k_safe = jnp.maximum(k, 0.0)
    return lgamma_diff(n, k_safe) - lax.lgamma(k_safe + 1.0)


def binomial_log_pmf(n, k, log_p, log1m_p):
    """Binomial log-pmf given log(p) and log(1-p) directly.

    Returns -inf where (k < 0) | (k > n) | (n < 0).  Interior computation is
    NaN-free so the -inf mask is gradient-safe.
    """
    dtype = jnp.result_type(n, k, log_p, log1m_p)
    n = jnp.asarray(n, dtype)
    k = jnp.asarray(k, dtype)
    valid = (k >= 0.0) & (k <= n) & (n >= 0.0)
    n_safe = jnp.where(valid, n, 1.0)
    k_safe = jnp.where(valid, k, 0.0)
    logpmf = (
        log_choose(n_safe, k_safe) + k_safe * log_p + (n_safe - k_safe) * log1m_p
    )
    return jnp.where(valid, logpmf, -jnp.inf)


def binomial_log_pmf_from_rate(n, k, rate_dt):
    """Binomial log-pmf with ``p = 1 - exp(-rate_dt)``.

    Exploits the exact identities ``log(1-p) = -rate_dt`` and
    ``log(p) = log(-expm1(-rate_dt))`` — no precision is lost forming ``p``.
    This is the per-cell term of the chain-binomial likelihood
    (reference spec: ``doc/lancs_space_model_concept.tex:256-268``).
    """
    dtype = jnp.result_type(n, k, rate_dt)
    rate_dt = jnp.asarray(rate_dt, dtype)
    rate_safe = jnp.maximum(rate_dt, jnp.finfo(dtype).tiny)
    log_p = jnp.log(-jnp.expm1(-rate_safe))
    return binomial_log_pmf(n, k, log_p, -rate_safe)
