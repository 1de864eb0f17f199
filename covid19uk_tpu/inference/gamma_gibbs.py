"""Near-iid conditional refresh of (gamma0, gamma1) given the events.

Framework extension (no reference counterpart — the reference's only
update of gamma0/gamma1 is the joint HMC block, ``inference.py:324-333``).

**Why.**  gamma0 is the binding mixing mode at equilibrium (tau ~ 1200 at
UK scale).  Its autocorrelation factors into (a) the slow infectious-
person-time mode PT (events move slowly) and (b) the HMC block's *partial*
refresh of the tight conditional p(gamma0 | events): one 505-dim HMC draw
with a diagonal mass and a global step size moves gamma0 only a fraction
of its conditional scale.  This kernel removes factor (b) exactly: the
I->R likelihood depends on (gamma0, gamma1) only through per-day
sufficient statistics, so the exact 2-D conditional

    f(g) = sum_t [ K_t * log(1 - exp(-r_t)) - (N_t - K_t) * r_t ]
           - |g|^2 / (2 * 100^2),      r_t = exp(g0 + g1 * wd_t)

with K_t = sum_m events[m, t, IR], N_t = sum_m state[m, t, I] (binomial
counts/exposures; lgamma terms are gamma-independent and cancel in every
ratio; priors N(0, 100), model_spec.py:188-198) can be sampled by a
Laplace independence MH step: Newton to the conditional mode, propose from
a Student-t(df=5) with the Laplace covariance (-H)^{-1}, accept by the
exact MH ratio.  The counts are O(1e4+), so the conditional is nearly
Gaussian and acceptance is ~1; the t proposal's polynomial tails dominate
the conditional's exponential left tail (log pi ~ sum(K) * g0 as
g0 -> -inf), so the sampler is uniformly ergodic — a Gaussian proposal
measurably sticks when started far left of the mode.  The proposal
parameters depend only on (K_t, N_t, wd_t) — fixed during the update — so
the move is exactly stationary for the conditional, hence for the joint.

Cost: O(T) per draw — invisible next to the 16-leapfrog HMC block.

**Measured result (UK synthetic, 16 chains, warm 4000, 1000 draws, 3
seeds):** gamma0 ESS 23.3±1.7 with the refresh vs 31.7±1.0 without;
min-ESS/sec 3.76±0.27 vs 5.02±0.22.  The conditional p(gamma0 | events)
is much tighter than the marginal, so the refresh pins gamma0 to the
slow infectious-person-time mode — removing factor (b) *exposes* factor
(a) instead of helping, while the HMC block's partial refresh was adding
decorrelating jitter around the slow mode.  Off by default
(`Mcmc.gamma_gibbs`); the exact conditional jump remains useful for
far-from-equilibrium starts (initialization transients), where gamma0
otherwise lags the moving person-time by the HMC coupling time.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

PRIOR_SD = 100.0  # gamma0, gamma1 ~ N(0, 100) (model_spec.py:188-198)
_NEWTON_ITERS = 8
_EXP_CLIP = 25.0  # exponent guard: rates beyond e^25 are out of range
_T_DF = 5.0  # proposal Student-t degrees of freedom


class GammaGibbsInfo(NamedTuple):
    is_accepted: jnp.ndarray
    log_accept_ratio: jnp.ndarray


def _f_grad_hess(g, K, N, wd):
    """Conditional log-density (up to a constant), gradient, Hessian.

    g: [2] = (gamma0, gamma1); K, N, wd: [T].
    """
    x = jnp.clip(g[0] + g[1] * wd, -_EXP_CLIP, _EXP_CLIP)  # [T]
    r = jnp.exp(x)
    em1 = -jnp.expm1(-r)  # 1 - exp(-r), stable for small r
    tiny = jnp.finfo(r.dtype).tiny
    f = jnp.sum(K * jnp.log(jnp.maximum(em1, tiny)) - (N - K) * r)
    f = f - 0.5 * jnp.sum(g * g) / PRIOR_SD**2

    # phi'(r) = K/(e^r - 1) - (N - K); phi''(r) = -K e^r/(e^r - 1)^2
    expm1r = jnp.maximum(jnp.expm1(r), tiny)
    phi1 = K / expm1r - (N - K)
    phi2 = -K * jnp.exp(jnp.minimum(r, _EXP_CLIP)) / expm1r**2
    dfdx = phi1 * r  # [T]
    d2fdx2 = phi2 * r * r + phi1 * r  # [T]

    grad = jnp.stack(
        [jnp.sum(dfdx), jnp.sum(dfdx * wd)]
    ) - g / PRIOR_SD**2
    h00 = jnp.sum(d2fdx2)
    h01 = jnp.sum(d2fdx2 * wd)
    h11 = jnp.sum(d2fdx2 * wd * wd)
    hess = jnp.array([[h00, h01], [h01, h11]]) - jnp.eye(2, dtype=g.dtype) / (
        PRIOR_SD**2
    )
    return f, grad, hess


def _newton_mode(g0, K, N, wd):
    """Fixed-iteration Newton ascent to the conditional mode."""

    def body(g, _):
        _, grad, hess = _f_grad_hess(g, K, N, wd)
        # 2x2 solve of hess @ step = grad (hess is negative definite near
        # the mode; the prior term bounds it away from singular)
        det = hess[0, 0] * hess[1, 1] - hess[0, 1] * hess[1, 0]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        s0 = (hess[1, 1] * grad[0] - hess[0, 1] * grad[1]) / det
        s1 = (hess[0, 0] * grad[1] - hess[1, 0] * grad[0]) / det
        step = jnp.stack([s0, s1])
        # trust region: a wild warmup state must not fling the mode search
        norm = jnp.sqrt(jnp.sum(step * step))
        step = step * jnp.minimum(1.0, 2.0 / jnp.maximum(norm, 1e-12))
        g_new = g - step  # Newton ascent: g - H^{-1} grad
        ok = jnp.all(jnp.isfinite(g_new))
        return jnp.where(ok, g_new, g), None

    g, _ = jax.lax.scan(body, g0, None, length=_NEWTON_ITERS)
    return g


def gamma_gibbs_step(key, g, events_ir_sum, state_i_sum, wd):
    """One Laplace independence-MH update of (gamma0, gamma1) | events.

    Args:
      key: PRNG key.
      g: [2] current (gamma0, gamma1) (identity bijection — u[3], u[4]).
      events_ir_sum: [T] K_t = sum_m events[m, t, 2] (daily removals).
      state_i_sum: [T] N_t = sum_m state[m, t, 2] (daily infectious).
      wd: [T] centred weekday indicator at the model's absolute times.

    Returns:
      (g_new [2], GammaGibbsInfo)
    """
    dtype = g.dtype
    K = events_ir_sum.astype(dtype)
    N = state_i_sum.astype(dtype)
    wd = wd.astype(dtype)

    mode = _newton_mode(g, K, N, wd)
    _, _, hess = _f_grad_hess(mode, K, N, wd)
    # proposal covariance = (-H)^{-1}; 2x2 Cholesky of -H, closed form
    a, b, c = -hess[0, 0], -hess[0, 1], -hess[1, 1]
    a = jnp.maximum(a, 1e-12)
    l11 = jnp.sqrt(a)
    l21 = b / l11
    l22 = jnp.sqrt(jnp.maximum(c - l21 * l21, 1e-12))

    def log_q(y):
        # Student-t(df) with scale matrix (L L^T)^{-1} (L = chol of -H):
        # log q = const - ((df+2)/2) log(1 + m/df), m = |L^T (y-mode)|^2.
        # Proposal params are the same forward and reverse, so constants
        # (including log|Sigma|) cancel in the MH ratio.
        z = (y - mode) @ jnp.stack(
            [jnp.stack([l11, jnp.zeros((), dtype)]), jnp.stack([l21, l22])]
        )  # z = L^T (y - mode)
        m = jnp.sum(z * z)
        return -0.5 * (_T_DF + 2.0) * jnp.log1p(m / _T_DF)

    k_prop, k_chi, k_acc = jax.random.split(key, 3)
    zs = jax.random.normal(k_prop, (2,), dtype)
    # chi2(df) = 2 * Gamma(df/2); t draw: y = mode + L^{-T} z / sqrt(u/df)
    u_chi = 2.0 * jax.random.gamma(k_chi, _T_DF / 2.0, (), dtype)
    zs = zs * jax.lax.rsqrt(jnp.maximum(u_chi / _T_DF, 1e-12))
    y1 = zs[1] / l22
    y0 = (zs[0] - l21 * y1) / l11
    prop = mode + jnp.stack([y0, y1])

    f_old, _, _ = _f_grad_hess(g, K, N, wd)
    f_new, _, _ = _f_grad_hess(prop, K, N, wd)
    log_ratio = (f_new - f_old) + (log_q(g) - log_q(prop))
    log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
    accept = (
        jnp.log(jax.random.uniform(k_acc, (), dtype).clip(1e-38)) < log_ratio
    )
    g_new = jnp.where(accept, prop, g)
    return g_new, GammaGibbsInfo(
        is_accepted=accept, log_accept_ratio=log_ratio
    )
