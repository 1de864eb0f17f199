"""Fused Pallas likelihood kernel: equivalence with the jnp path.

On the CPU test backend the kernel runs in interpret mode — the identical
kernel code (including the in-kernel Stirling lgamma and expm1-free
binomial pmf) is exercised; on TPU it compiles via Mosaic (driven by the
verify flow / bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import CovidUK
from covid19uk_tpu.ops.pallas.fused_loglik import (
    chain_binomial_loglik_pallas,
    _lgamma_diff,
    _lgamma1p,
    _log_pm,
)
from tests.test_spec import make_test_data, make_test_params


def test_inkernel_numerics_match_reference():
    """The kernel's lgamma/log primitives match scipy outside Pallas."""
    from scipy import special

    n = np.array([0.0, 3.0, 25.0, 1e4, 1.9e6], np.float32)
    k = np.array([0.0, 2.0, 25.0, 137.0, 2000.0], np.float32)
    got = np.asarray(_lgamma_diff(jnp.asarray(n), jnp.asarray(k)))
    want = special.gammaln(n.astype(np.float64) + 1) - special.gammaln(
        n.astype(np.float64) - k.astype(np.float64) + 1
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)

    got = np.asarray(_lgamma1p(jnp.asarray(k)))
    want = special.gammaln(k.astype(np.float64) + 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    r = np.array([1e-6, 1e-3, 0.05, 1.0, 10.0], np.float32)
    got = np.asarray(_log_pm(jnp.asarray(r)))
    want = np.log(-np.expm1(-r.astype(np.float64)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.fixture
def small_problem(rng):
    M, T = 5, 16
    data = make_test_data(rng, M, T, jnp.float32)
    params = make_test_params(rng, M, T, jnp.float32)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60, np.full(M, 25.0), np.full(M, 35.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float32), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(0), params)
    state = seir.compute_state(model.initial_state, events)
    return model, params, events, state


def test_pallas_value_matches_jnp(small_problem):
    model, params, events, state = small_problem
    rates = model.transition_rates(params, state)
    ref = float(
        seir.chain_binomial_log_prob(events, rates, model.initial_state)
    )
    got = float(chain_binomial_loglik_pallas(model, params, events, state))
    assert abs(ref - got) / abs(ref) < 5e-4, (ref, got)


def test_pallas_grad_matches_jnp(small_problem):
    model, params, events, state = small_problem

    def jnp_ll(p):
        r = model.transition_rates(p, state)
        return seir.chain_binomial_log_prob(events, r, model.initial_state)

    def pl_ll(p):
        return chain_binomial_loglik_pallas(model, p, events, state)

    g_ref = jax.grad(jnp_ll)(params)
    g_got = jax.grad(pl_ll)(params)
    for name in ["psi", "gamma0", "gamma1", "alpha_0", "beta_area",
                 "sigma_space"]:
        a = float(getattr(g_ref, name))
        b = float(getattr(g_got, name))
        assert abs(a - b) / max(abs(a), 1e-6) < 2e-3, (name, a, b)
    np.testing.assert_allclose(
        np.asarray(g_ref.alpha_t), np.asarray(g_got.alpha_t),
        rtol=5e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_ref.spatial_effect), np.asarray(g_got.spatial_effect),
        rtol=5e-3, atol=1e-4,
    )


def test_pallas_invalid_events_neg_inf(small_problem):
    model, params, events, state = small_problem
    bad = events.at[0, 0, 1].set(1e7)
    bad_state = seir.compute_state(model.initial_state, bad)
    got = float(chain_binomial_loglik_pallas(model, params, bad, bad_state))
    assert np.isneginf(got)
