"""Correctness of the conditional (gamma0, gamma1) Gibbs kernel.

The kernel (inference/gamma_gibbs.py) is a Laplace independence-MH update
of the exact 2-D conditional; its invariant distribution must equal

    p(g) propto exp( sum_t [K_t log(1-e^{-r_t}) - (N_t-K_t) r_t]
                     - |g|^2/(2*100^2) ),   r_t = exp(g0 + g1 wd_t)

These tests check the empirical long-run moments against 2-D quadrature
of that density, plus acceptance sanity and integration with the full
Gibbs step (the knob must leave every other state component's path
bitwise unchanged given the same keys — the update happens after the
sweep and touches only u[3:5])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.inference.gamma_gibbs import (
    PRIOR_SD,
    gamma_gibbs_step,
)


def _stats(T=14, seed=0):
    rng = np.random.default_rng(seed)
    wd = (rng.random(T) < 2 / 7).astype(np.float64)
    wd = wd - wd.mean()  # centred, like the model's weekday covariate
    K = rng.integers(20, 80, T).astype(np.float64)
    N = K + rng.integers(100, 300, T).astype(np.float64)
    return jnp.asarray(K), jnp.asarray(N), jnp.asarray(wd)


def _log_density(g0, g1, K, N, wd):
    r = np.exp(g0 + g1 * np.asarray(wd)[:, None, None])
    K = np.asarray(K)[:, None, None]
    N = np.asarray(N)[:, None, None]
    lp = np.sum(K * np.log1p(-np.exp(-r)) - (N - K) * r, axis=0)
    return lp - (g0**2 + g1**2) / (2 * PRIOR_SD**2)


def _quadrature_moments(K, N, wd):
    # centre the grid roughly at the MLE of the pooled rate
    r0 = float(np.sum(K) / np.sum(N))
    c0 = np.log(-np.log1p(-r0))  # rate from pooled exceedance probability
    g0 = np.linspace(c0 - 1.0, c0 + 1.0, 601)
    g1 = np.linspace(-1.5, 1.5, 601)
    G0, G1 = np.meshgrid(g0, g1, indexing="ij")
    lp = _log_density(G0, G1, K, N, wd)
    w = np.exp(lp - lp.max())
    w /= w.sum()
    m0 = float((w * G0).sum())
    m1 = float((w * G1).sum())
    v0 = float((w * (G0 - m0) ** 2).sum())
    v1 = float((w * (G1 - m1) ** 2).sum())
    cov = float((w * (G0 - m0) * (G1 - m1)).sum())
    # grid must comfortably contain the mass
    assert w[0, :].max() < 1e-12 and w[-1, :].max() < 1e-12
    assert w[:, 0].max() < 1e-12 and w[:, -1].max() < 1e-12
    return np.array([m0, m1]), np.array([[v0, cov], [cov, v1]])


def test_invariant_distribution_matches_quadrature():
    K, N, wd = _stats()
    mean_q, cov_q = _quadrature_moments(K, N, wd)

    n = 20000

    def body(g, k):
        g, info = gamma_gibbs_step(k, g, K, N, wd)
        return g, (g, info.is_accepted)

    keys = jax.random.split(jax.random.PRNGKey(1), n)
    g0 = jnp.asarray([0.5, -0.5])  # deliberately off-mode start
    _, (draws, acc) = jax.lax.scan(body, g0, keys)
    draws = np.asarray(draws)[200:]  # tiny burn-in
    acc_rate = float(np.asarray(acc).mean())

    # Laplace-t proposal on a near-Gaussian conditional: the t tails cost
    # ~0.13 acceptance (the price of uniform ergodicity; Gaussian proposal
    # sticks from far-left starts)
    assert acc_rate > 0.80, acc_rate

    mean_e = draws.mean(axis=0)
    cov_e = np.cov(draws.T)
    # near-iid draws: MC error of the mean ~ sd/sqrt(n)
    se = np.sqrt(np.diag(cov_q) / len(draws))
    assert np.all(np.abs(mean_e - mean_q) < 6 * se), (mean_e, mean_q, se)
    assert np.allclose(np.diag(cov_e), np.diag(cov_q), rtol=0.15)
    # correlation (weekday effect couples the two)
    corr_q = cov_q[0, 1] / np.sqrt(cov_q[0, 0] * cov_q[1, 1])
    corr_e = cov_e[0, 1] / np.sqrt(cov_e[0, 0] * cov_e[1, 1])
    assert abs(corr_e - corr_q) < 0.1, (corr_e, corr_q)


def test_far_start_converges():
    """Independence sampler must recover from a far-off initial point
    (warmup robustness: the Newton mode search is start-independent)."""
    K, N, wd = _stats(seed=3)
    mean_q, cov_q = _quadrature_moments(K, N, wd)

    def body(g, k):
        g, info = gamma_gibbs_step(k, g, K, N, wd)
        return g, g

    keys = jax.random.split(jax.random.PRNGKey(2), 3000)
    for start in ([5.0, 3.0], [-8.0, 0.0]):
        _, draws = jax.lax.scan(body, jnp.asarray(start), keys)
        m = np.asarray(draws)[100:].mean(axis=0)
        assert np.all(np.abs(m - mean_q) < 10 * np.sqrt(np.diag(cov_q) / 2900))


def test_zero_removal_days_are_finite():
    K, N, wd = _stats(seed=4)
    K = K.at[:5].set(0.0)
    g, info = gamma_gibbs_step(
        jax.random.PRNGKey(0), jnp.asarray([0.0, 0.0]), K, N, wd
    )
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.isfinite(float(info.log_accept_ratio))


def test_full_step_integration():
    """gamma_gibbs=True must (a) run, (b) change only u[3:5] relative to
    the same step with the knob off under identical keys, and (c) keep the
    trace shape contract."""
    from covid19uk_tpu.inference.gibbs import (
        ChainState,
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    M, T = 11, 32
    model = build_synthetic_model(M, T, jnp.float32)
    state = initial_chain_state(model)
    cfg = EventKernelConfig(
        dmax=14, mmax=2, nmax=10, occult_nmax=5,
        num_event_time_updates=2, t_range=(T - 21, T),
    )
    tune = HMCTunables(
        step_size=jnp.asarray(0.001, jnp.float32),
        inv_mass_diag=jnp.ones_like(state.u),
    )
    key = jax.random.PRNGKey(7)
    step_off = make_mcmc_step(model, 2, cfg)
    step_on = make_mcmc_step(model, 2, cfg._replace(gamma_gibbs=True))
    s_off, tr_off = jax.jit(step_off)(key, state, tune)
    s_on, tr_on = jax.jit(step_on)(key, state, tune)

    np.testing.assert_array_equal(
        np.asarray(s_off.events), np.asarray(s_on.events)
    )
    u_off, u_on = np.asarray(s_off.u), np.asarray(s_on.u)
    np.testing.assert_array_equal(u_off[:3], u_on[:3])
    np.testing.assert_array_equal(u_off[5:], u_on[5:])
    assert not tr_off.gamma.is_accepted  # zeros when off
    assert np.asarray(tr_on.gamma.log_accept_ratio).shape == ()


@pytest.mark.slow
def test_conditional_refresh_is_near_iid_in_full_step():
    """Within the full Gibbs step on a fixed event tensor (no event
    kernels accepted at zero proposals... instead: measure that gamma0's
    lag-1 autocorrelation given ~fixed events drops with the knob on)."""
    from covid19uk_tpu.inference.gibbs import (
        ChainState,
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    M, T = 11, 32
    model = build_synthetic_model(M, T, jnp.float32)
    state = initial_chain_state(model)
    cfg = EventKernelConfig(
        dmax=14, mmax=2, nmax=10, occult_nmax=5,
        num_event_time_updates=1, t_range=(T - 21, T),
        num_pair_updates=0,
    )
    tune = HMCTunables(
        step_size=jnp.asarray(0.02, jnp.float32),
        inv_mass_diag=jnp.ones_like(state.u) * 0.01,
    )

    def chain(step, n, key):
        def body(s, k):
            s, _ = step(k, s, tune)
            return s, s.u[3]

        _, g0s = jax.lax.scan(body, state, jax.random.split(key, n))
        return np.asarray(g0s)

    n = 1500
    g_off = chain(jax.jit(make_mcmc_step(model, 4, cfg)), n, jax.random.PRNGKey(0))
    g_on = chain(
        jax.jit(make_mcmc_step(model, 4, cfg._replace(gamma_gibbs=True))),
        n,
        jax.random.PRNGKey(0),
    )

    def rho1(x):
        x = x[300:] - x[300:].mean()
        return float((x[1:] * x[:-1]).mean() / (x * x).mean())

    assert rho1(g_on) < rho1(g_off) + 0.05  # never worse
    # and the conditional part decorrelates hard
    assert rho1(g_on) < 0.9
