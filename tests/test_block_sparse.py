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


def test_auto_gate_rejects_multichain(rng):
    """sparse='auto' skips the BSR build for multi-chain runs (batched BSR
    measured slower than dense at every C >= 2 — tools/bench_block_sparse
    and tools/validate_sparse_gate); True still forces it."""
    from covid19uk_tpu.models.spec import _maybe_block_sparse

    a = _random_symmetric_sparse(rng, 1536, n_entries=400)
    assert _maybe_block_sparse(a, jnp.float32, "auto", num_chains=1) \
        is not None
    assert _maybe_block_sparse(a, jnp.float32, "auto", num_chains=4) is None
    assert _maybe_block_sparse(a, jnp.float32, True, num_chains=4) \
        is not None


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


def test_banded_sym_quad_matvec_match_dense(rng):
    """BandedSym (block-tridiagonal CAR-precision operator): quad/matvec
    parity with dense, including gradient and the vmapped-chains path."""
    from covid19uk_tpu.ops.banded import BandedSym

    M = 300
    # adjacency-like sparse SPD-ish matrix (banded after RCM)
    a = np.zeros((M, M))
    for i in range(M):
        for j in (i - 2, i - 1, i + 1, i + 2):
            if 0 <= j < M and abs(i * 7919 % 13) > 3:
                a[i, j] = a[j, i] = -0.25
    a[np.arange(M), np.arange(M)] = 4.0
    # scramble the ordering so RCM has work to do
    p = np.random.default_rng(0).permutation(M)
    a = a[np.ix_(p, p)]

    band = BandedSym.from_dense(a, jnp.float64)
    np.testing.assert_allclose(band.todense(), a, atol=1e-12)

    x = jnp.asarray(rng.normal(size=M))
    np.testing.assert_allclose(
        float(band.quad(x)), float(np.asarray(x) @ a @ np.asarray(x)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(band.matvec(x)), a @ np.asarray(x), rtol=1e-10
    )
    # gradient of the quadratic form is 2 A x (symmetric A)
    g = jax.grad(lambda x: 0.5 * band.quad(x))(x)
    np.testing.assert_allclose(np.asarray(g), a @ np.asarray(x), rtol=1e-9)
    # vmapped chains
    xb = jnp.asarray(rng.normal(size=(4, M)))
    qb = jax.jit(jax.vmap(band.quad))(xb)
    want = np.einsum("ci,ij,cj->c", np.asarray(xb), a, np.asarray(xb))
    np.testing.assert_allclose(np.asarray(qb), want, rtol=1e-10)


def test_row_sharded_matmul_matches_dense(rng):
    """Space-sharded path (SURVEY.md §2.8): values/col_idx sharded along
    the block-row axis over a mesh run each device's row band locally
    (custom_partitioning rule) — parity with dense, single and batched,
    value and gradient, on the 8-device CPU mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    M, T = 2 * BLOCK, 24
    a = _random_symmetric_sparse(rng, M, n_entries=600)
    bs = BlockSparse.from_dense(a, jnp.float32)
    assert bs.col_idx.shape[0] == 2

    mesh = Mesh(np.array(jax.devices()[:2]), ("space",))
    bs_sh = BlockSparse(
        jax.device_put(
            bs.values, NamedSharding(mesh, P("space", None, None, None))
        ),
        jax.device_put(bs.col_idx, NamedSharding(mesh, P("space", None))),
        bs.n,
        bs.perm,
        bs.inv_perm,
    )
    x = jnp.asarray(rng.normal(size=(M, T)), jnp.float32)
    y = jax.jit(lambda b, x: b.matmul(x))(bs_sh, x)
    np.testing.assert_allclose(
        np.asarray(y), a.astype(np.float32) @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )

    # gradient through the sharded operator
    g = jax.jit(
        jax.grad(lambda x: jnp.sum(jnp.tanh(bs_sh.matmul(x))))
    )(x)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.tanh(bs.matmul(x))))(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )

    # batched chains on a (chain x space) mesh — 2-D parallelism
    mesh2 = Mesh(np.array(jax.devices()).reshape(4, 2), ("chain", "space"))
    bs_sh2 = BlockSparse(
        jax.device_put(
            bs.values, NamedSharding(mesh2, P("space", None, None, None))
        ),
        jax.device_put(bs.col_idx, NamedSharding(mesh2, P("space", None))),
        bs.n,
        bs.perm,
        bs.inv_perm,
    )
    xb = jax.device_put(
        jnp.asarray(rng.normal(size=(8, M, T)), jnp.float32),
        NamedSharding(mesh2, P("chain", None, None)),
    )
    yb = jax.jit(jax.vmap(lambda b, x: b.matmul(x), in_axes=(None, 0)))(
        bs_sh2, xb
    )
    np.testing.assert_allclose(
        np.asarray(yb),
        np.einsum("ij,cjt->cit", a.astype(np.float32), np.asarray(xb)),
        rtol=1e-4, atol=1e-4,
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
    assert sparse.data.car_band is not None

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
