"""Block-sparse Pallas operator: format, matmul, autodiff, model parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.ops.pallas.block_sparse import BLOCK, BlockSparse


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _random_symmetric_sparse(rng, M, n_entries=60):
    a = np.zeros((M, M))
    idx = rng.integers(0, M, size=(n_entries, 2))
    vals = rng.normal(size=n_entries)
    for (i, j), v in zip(idx, vals):
        a[i, j] = a[j, i] = v
    a += np.diag(rng.normal(size=M))
    return a


def test_from_dense_roundtrip(rng):
    a = _random_symmetric_sparse(rng, 300)
    bs = BlockSparse.from_dense(a, jnp.float64)
    np.testing.assert_allclose(bs.todense(), a)
    assert bs.block_density <= 1.0


def test_from_dense_rejects_asymmetric(rng):
    a = rng.normal(size=(64, 64))
    with pytest.raises(ValueError, match="symmetric"):
        BlockSparse.from_dense(a)


def test_matmul_matches_dense(rng):
    M, T = 300, 24
    a = _random_symmetric_sparse(rng, M)
    bs = BlockSparse.from_dense(a, jnp.float32)
    x = rng.normal(size=(M, T)).astype(np.float32)
    got = np.asarray(bs.matmul(jnp.asarray(x)))
    np.testing.assert_allclose(got, a @ x, rtol=1e-4, atol=1e-4)
    # 1-D input (the CAR quadratic-form path)
    v = rng.normal(size=M).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bs.matmul(jnp.asarray(v))), a @ v, rtol=1e-4, atol=1e-4
    )


def test_matmul_grad_and_vmap(rng):
    """The production composition: jit(vmap(grad(...))) over chains."""
    M, T, C = 200, 16, 3
    a = _random_symmetric_sparse(rng, M)
    bs = BlockSparse.from_dense(a, jnp.float32)
    ad = jnp.asarray(a, jnp.float32)
    xb = jnp.asarray(rng.normal(size=(C, M, T)), jnp.float32)

    def f_sparse(x):
        return jnp.sum(jnp.tanh(bs.matmul(x)))

    def f_dense(x):
        return jnp.sum(jnp.tanh(ad @ x))

    got = jax.jit(jax.vmap(jax.grad(f_sparse)))(xb)
    want = jax.vmap(jax.grad(f_dense))(xb)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4
    )


def test_non_multiple_of_block(rng):
    """Logical size not a multiple of 128: padding must be transparent."""
    M, T = BLOCK + 37, 5
    a = _random_symmetric_sparse(rng, M, n_entries=40)
    bs = BlockSparse.from_dense(a, jnp.float32)
    x = rng.normal(size=(M, T)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bs.matmul(jnp.asarray(x))), a @ x, rtol=1e-4, atol=1e-4
    )


def test_sparse_model_matches_dense():
    """CovidUK with block-sparse operators == the dense model: density and
    gradient, at synthetic-gravity covariates (naturally sparse flows)."""
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    M, T = 150, 12
    dense = build_synthetic_model(M, T, jnp.float32, sparse=False)
    sparse = build_synthetic_model(M, T, jnp.float32, sparse=True)
    assert sparse.data.Cstar_bsr is not None
    assert sparse.data.car_prec_bsr is not None

    state = initial_chain_state(dense)

    def lp(model, u):
        return model.joint_log_prob_unconstrained(u, state.events)

    v_dense = float(jax.jit(lp)(dense, state.u))
    v_sparse = float(jax.jit(lp)(sparse, state.u))
    np.testing.assert_allclose(v_sparse, v_dense, rtol=2e-5)

    g_dense = jax.jit(jax.grad(lp, argnums=1))(dense, state.u)
    g_sparse = jax.jit(jax.grad(lp, argnums=1))(sparse, state.u)
    np.testing.assert_allclose(
        np.asarray(g_sparse), np.asarray(g_dense), rtol=2e-3, atol=1e-3
    )


def test_sparse_mcmc_step_runs():
    """A full MCMC transition through the sparse operators stays finite."""
    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    M, T = 150, 12
    model = build_synthetic_model(M, T, jnp.float32, sparse=True)
    state = initial_chain_state(model)
    cfg = EventKernelConfig(
        dmax=5, mmax=2, nmax=10, occult_nmax=5,
        num_event_time_updates=2, t_range=(T - 6, T),
    )
    step = make_mcmc_step(model, 4, cfg)
    tune = HMCTunables(
        step_size=jnp.asarray(0.02, jnp.float32),
        inv_mass_diag=jnp.ones_like(state.u),
    )
    new_state, trace = jax.jit(step)(
        jax.random.PRNGKey(0), state, tune, model
    )
    assert np.isfinite(float(trace.hmc.target_log_prob))
    assert np.all(np.isfinite(np.asarray(new_state.u)))


def test_windowed_evaluator_uses_bsr_and_matches_dense():
    """The E->I windowed delta routes its commute matmul through the
    block-sparse operator when present and agrees with the dense path."""
    from covid19uk_tpu.inference.likelihood import (
        WindowedEvaluator, make_context,
    )
    from covid19uk_tpu.models import seir
    from covid19uk_tpu.models.spec import (
        constrain_parameters, unpack_parameters,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model, initial_chain_state,
    )

    M, T = 150, 12
    dense = build_synthetic_model(M, T, jnp.float32, sparse=False)
    sparse = build_synthetic_model(M, T, jnp.float32, sparse=True)
    state = initial_chain_state(dense)
    params = unpack_parameters(constrain_parameters(state.u), T, M)
    full_state = seir.compute_state(dense.initial_state, state.events)

    ctx_d = make_context(dense, params)
    ctx_s = make_context(sparse, params)
    assert ctx_s.Cstar_bsr is not None and ctx_d.Cstar_bsr is None
    ev_d = WindowedEvaluator(ctx=ctx_d, window=6)
    ev_s = WindowedEvaluator(ctx=ctx_s, window=6)

    # an E->I move at a location with events
    evn = np.asarray(state.events)
    locs, ts = np.nonzero(evn[:, :, 1] > 0)
    loc, t_from = int(locs[0]), int(ts[0])
    t_to = min(t_from + 2, T - 1)
    d_dense = float(ev_d.move_delta(
        state.events, full_state, loc, t_from, t_to, 1.0, 1))
    d_sparse = float(ev_s.move_delta(
        state.events, full_state, loc, t_from, t_to, 1.0, 1))
    assert np.isfinite(d_dense)
    np.testing.assert_allclose(d_sparse, d_dense, rtol=1e-4, atol=1e-4)
