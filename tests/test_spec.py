"""Tests for the CovidUK model spec: packing, bijector, priors, rates."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import (
    CovidUK,
    ModelData,
    Parameters,
    constrain_log_det_jacobian,
    constrain_parameters,
    pack_parameters,
    unconstrain_parameters,
    unpack_parameters,
)


def make_test_data(rng, M=5, T=10, dtype=jnp.float64):
    C = rng.uniform(0, 100, size=(M, M))
    adjacency = (rng.uniform(size=(M, M)) < 0.4).astype(float)
    adjacency = np.maximum(adjacency, adjacency.T)
    np.fill_diagonal(adjacency, 0)
    # ensure no isolated nodes (CAR precision must be PD-ish)
    for i in range(M):
        if adjacency[i].sum() == 0:
            j = (i + 1) % M
            adjacency[i, j] = adjacency[j, i] = 1.0
    covariates = {
        "C": C,
        "W": np.ones(T),
        "N": rng.uniform(5e4, 5e5, size=M),
        "adjacency": adjacency,
        "weekday": (np.arange(T) % 7 < 5).astype(float),
        "area": rng.uniform(1e8, 5e9, size=M),
    }
    return ModelData.create(covariates, dtype)


def make_test_params(rng, M, T, dtype=jnp.float64):
    return Parameters(
        psi=jnp.asarray(0.3, dtype),
        sigma_space=jnp.asarray(0.05, dtype),
        beta_area=jnp.asarray(0.1, dtype),
        gamma0=jnp.asarray(-1.0, dtype),
        gamma1=jnp.asarray(0.05, dtype),
        alpha_0=jnp.asarray(-4.0, dtype),
        alpha_t=jnp.asarray(rng.normal(0, 0.005, T - 1), dtype),
        spatial_effect=jnp.asarray(rng.normal(0, 0.3, M), dtype),
    )


def test_pack_unpack_roundtrip(rng):
    M, T = 5, 10
    p = make_test_params(rng, M, T)
    flat = pack_parameters(p)
    assert flat.shape == (6 + (T - 1) + M,)
    p2 = unpack_parameters(flat, T, M)
    for a, b in zip(p, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # reference packing order (inference.py:285-300)
    np.testing.assert_allclose(float(flat[0]), float(p.psi))
    np.testing.assert_allclose(float(flat[1]), float(p.sigma_space))
    np.testing.assert_allclose(float(flat[5]), float(p.alpha_0))


def test_bijector_roundtrip_and_jacobian():
    u = jnp.asarray(np.array([-2.0, 0.5, 1.3, -0.7, 2.2]), jnp.float64)
    x = constrain_parameters(u)
    assert float(x[0]) > 0 and float(x[1]) > 0
    np.testing.assert_allclose(
        np.asarray(unconstrain_parameters(x)), np.asarray(u), rtol=1e-9
    )
    # identity on the tail
    np.testing.assert_allclose(np.asarray(x[2:]), np.asarray(u[2:]))
    # jacobian = sum log sigmoid over the softplus block
    want = np.log(1 / (1 + np.exp(2.0))) + np.log(1 / (1 + np.exp(-0.5)))
    np.testing.assert_allclose(
        float(constrain_log_det_jacobian(u)), want, rtol=1e-9
    )
    # autodiff check of the jacobian
    jac = jax.jacfwd(constrain_parameters)(u)
    _, logdet = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(
        float(constrain_log_det_jacobian(u)), logdet, rtol=1e-9
    )


def test_log_prior_matches_scipy(rng):
    M, T = 5, 10
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    model = CovidUK(data, jnp.zeros((M, 4)), 0, T)
    got = float(model.log_prior(params))

    adjacency = None  # recompute CAR pieces from data
    prec = np.asarray(data.car_precision)
    cov = np.linalg.inv(prec)
    want = (
        stats.norm.logpdf(float(params.alpha_0), 0, 10)
        + stats.norm.logpdf(float(params.beta_area), 0, 1)
        + stats.gamma.logpdf(float(params.psi), a=3, scale=1 / 10)
        + stats.norm.logpdf(np.asarray(params.alpha_t), 0, 0.005).sum()
        + stats.halfnorm.logpdf(float(params.sigma_space), 0, 0.1)
        + stats.multivariate_normal.logpdf(
            np.asarray(params.spatial_effect), np.zeros(M), cov
        )
        + stats.norm.logpdf(float(params.gamma0), 0, 100)
        + stats.norm.logpdf(float(params.gamma1), 0, 100)
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_batched_rates_match_per_step_fn(rng):
    """The all-times batched rate computation must equal the per-step fn."""
    M, T = 5, 10
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 20, np.full(M, 8.0), np.full(M, 12.0), np.zeros(M)], axis=-1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)

    key = jax.random.PRNGKey(1)
    events = model.sample_seir(key, params)
    state = seir.compute_state(model.initial_state, events)

    batched = np.asarray(model.transition_rates(params, state))  # [M,T,3]
    fn = model.transition_rate_fn(params)
    for t in range(T):
        per_step = np.asarray(fn(t, state[:, t, :]))  # [M,3]
        np.testing.assert_allclose(batched[:, t, :], per_step, rtol=1e-12)


def test_batched_rates_initial_step_offset(rng):
    """initial_step shifts the absolute time gathers (prediction mode)."""
    M, T = 5, 10
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 20, np.full(M, 8.0), np.full(M, 12.0), np.zeros(M)], axis=-1
    )
    init_step, num = 4, 3
    model = CovidUK(data, jnp.asarray(init, jnp.float64), init_step, num)
    state = jnp.asarray(
        np.broadcast_to(init[:, None, :], (M, num, 4)), jnp.float64
    )
    batched = np.asarray(model.transition_rates(params, state))
    fn = model.transition_rate_fn(params)
    for i, t in enumerate(range(init_step, init_step + num)):
        per_step = np.asarray(fn(t, state[:, i, :]))
        np.testing.assert_allclose(batched[:, i, :], per_step, rtol=1e-12)


def test_joint_log_prob_finite_and_differentiable(rng):
    M, T = 5, 10
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 20, np.full(M, 8.0), np.full(M, 12.0), np.zeros(M)], axis=-1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(2), params)

    u = unconstrain_parameters(pack_parameters(params))
    lp = model.joint_log_prob_unconstrained(u, events)
    assert np.isfinite(float(lp))
    g = jax.grad(model.joint_log_prob_unconstrained)(u, events)
    assert np.all(np.isfinite(np.asarray(g)))

    # zero-vector init used by the reference (inference.py:563-576) is finite
    u0 = jnp.zeros_like(u)
    assert np.isfinite(float(model.joint_log_prob_unconstrained(u0, events)))


def test_reduced_loglik_matches_full(rng):
    """The constant-hoisted leapfrog likelihood (reduced_loglik_fn) must
    equal summing binomial_log_pmf_from_rate over the full rate tensor —
    value and parameter gradient."""
    from covid19uk_tpu.ops.binomial import binomial_log_pmf_from_rate

    M, T = 6, 14
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 50, np.full(M, 20.0), np.full(M, 30.0), np.zeros(M)], axis=-1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(4), params)
    state = seir.compute_state(model.initial_state, events)
    commute = model.commute_pressure(state[..., 2])
    n_src = state[..., seir.SOURCE_STATES]

    flat = pack_parameters(params)

    def full(flat):
        p = unpack_parameters(flat, T, M)
        rates = model.transition_rates(p, state, commute)
        return jnp.sum(binomial_log_pmf_from_rate(n_src, events, rates))

    reduced_fn = model.reduced_loglik_fn(events, state, commute)
    reduced = lambda flat: reduced_fn(unpack_parameters(flat, T, M))

    np.testing.assert_allclose(
        float(reduced(flat)), float(full(flat)), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(reduced)(flat)),
        np.asarray(jax.grad(full)(flat)),
        rtol=1e-8,
        atol=1e-10,
    )

    # an invalid event tensor (y > n) must still be -inf
    bad = events.at[0, 0, 0].add(1e6)
    bad_state = seir.compute_state(model.initial_state, bad)
    bad_fn = model.reduced_loglik_fn(
        bad, bad_state, model.commute_pressure(bad_state[..., 2])
    )
    assert float(bad_fn(params)) == -np.inf


def test_float32_log_prob_close_to_float64(rng):
    """float32 TPU path must track the float64 CPU path to ~1e-3 relative."""
    M, T = 8, 20
    rng2 = np.random.default_rng(7)
    data64 = make_test_data(rng2, M, T, jnp.float64)
    rng2 = np.random.default_rng(7)
    data32 = make_test_data(rng2, M, T, jnp.float32)
    params64 = make_test_params(rng, M, T, jnp.float64)
    params32 = Parameters(*(jnp.asarray(x, jnp.float32) for x in params64))

    N = np.asarray(data64.N)
    init = np.stack(
        [N - 50, np.full(M, 20.0), np.full(M, 30.0), np.zeros(M)], axis=-1
    )
    model64 = CovidUK(data64, jnp.asarray(init, jnp.float64), 0, T)
    model32 = CovidUK(data32, jnp.asarray(init, jnp.float32), 0, T)
    events = model64.sample_seir(jax.random.PRNGKey(3), params64)

    lp64 = float(model64.log_prob(params64, events))
    lp32 = float(
        model32.log_prob(params32, jnp.asarray(events, jnp.float32))
    )
    assert abs(lp64 - lp32) / abs(lp64) < 1e-3
