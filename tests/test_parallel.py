"""Parallel layer tests: meshes, sharded stepping, diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.parallel import (
    chain_mesh,
    chain_space_mesh,
    effective_sample_size,
    potential_scale_reduction,
)


def test_rhat_iid_near_one(rng):
    draws = jnp.asarray(rng.normal(size=(4, 500, 3)))
    r = np.asarray(potential_scale_reduction(draws))
    assert r.shape == (3,)
    np.testing.assert_allclose(r, 1.0, atol=0.05)


def test_rhat_detects_disjoint_chains(rng):
    a = rng.normal(0, 1, size=(2, 300))
    b = rng.normal(10, 1, size=(2, 300))
    draws = jnp.asarray(np.concatenate([a, b], axis=0))
    r = float(potential_scale_reduction(draws))
    assert r > 2.0


def test_ess_iid_close_to_total(rng):
    C, N = 4, 1000
    draws = jnp.asarray(rng.normal(size=(C, N)))
    ess = float(effective_sample_size(draws))
    assert 0.5 * C * N < ess < 1.5 * C * N


def test_ess_correlated_much_smaller(rng):
    C, N, rho = 4, 1000, 0.95
    x = np.zeros((C, N))
    x[:, 0] = rng.normal(size=C)
    for t in range(1, N):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * rng.normal(size=C)
    ess = float(effective_sample_size(jnp.asarray(x)))
    # theoretical ESS factor (1-rho)/(1+rho) ~ 0.026
    assert ess < 0.15 * C * N


def test_chain_mesh_shapes():
    mesh = chain_mesh(8)
    assert mesh.shape == {"chain": 8}
    mesh2 = chain_space_mesh(8)
    assert mesh2.shape == {"chain": 4, "space": 2}
    mesh3 = chain_space_mesh(2)
    assert mesh3.shape == {"chain": 2, "space": 1}


def test_sharded_step_matches_vmap(rng):
    """The mesh-sharded step must produce bitwise-identical chains to plain
    vmap on one device (pure data parallelism, same PRNG)."""
    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.parallel.sharding import (
        make_sharded_step,
        shard_chain_state,
    )
    from tests.test_spec import make_test_data, make_test_params
    from covid19uk_tpu.models.spec import (
        CovidUK,
        pack_parameters,
        unconstrain_parameters,
    )
    from covid19uk_tpu.inference.gibbs import ChainState

    M, T, C = 4, 8, 8
    data = make_test_data(rng, M, T, jnp.float32)
    params = make_test_params(rng, M, T, jnp.float32)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 50, np.full(M, 20.0), np.full(M, 30.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float32), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(0), params)
    u = unconstrain_parameters(pack_parameters(params))
    single = ChainState(u=u, events=events)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (C,) + x.shape), single
    )
    cfg = EventKernelConfig(
        dmax=3, mmax=2, nmax=5, occult_nmax=3,
        num_event_time_updates=2, t_range=(T - 4, T),
    )
    step = make_mcmc_step(model, 4, cfg)
    tune = HMCTunables(
        step_size=jnp.full((C,), 0.05, jnp.float32),
        inv_mass_diag=jnp.ones((C,) + u.shape, jnp.float32),
    )
    keys = jax.random.split(jax.random.PRNGKey(1), C)

    ref_state, ref_trace = jax.jit(jax.vmap(step))(keys, state, tune)

    mesh = chain_mesh(8)
    sstep = make_sharded_step(step, mesh, donate=False)
    sh_state = shard_chain_state(state, mesh)
    got_state, got_trace = sstep(keys, sh_state, tune)

    np.testing.assert_array_equal(
        np.asarray(ref_state.u), np.asarray(got_state.u)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_state.events), np.asarray(got_state.events)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_trace.hmc.is_accepted),
        np.asarray(got_trace.hmc.is_accepted),
    )


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_gate_statistics_matches_jnp_diagnostics(rng):
    """The numpy between-burst gate must agree with the jnp diagnostics."""
    from covid19uk_tpu.parallel.diagnostics import (
        effective_sample_size,
        gate_statistics,
        potential_scale_reduction,
    )

    C, N, P = 4, 200, 3
    # AR(1) draws with chain-specific offsets -> nontrivial rhat and ESS
    eps = rng.normal(size=(C, N, P))
    x = np.zeros((C, N, P))
    for t in range(1, N):
        x[:, t] = 0.7 * x[:, t - 1] + eps[:, t]
    x += rng.normal(size=(C, 1, P)) * 0.5

    max_rhat, min_ess = gate_statistics(x)
    rhat_j = np.asarray(potential_scale_reduction(jnp.asarray(x)))
    ess_j = np.asarray(effective_sample_size(jnp.asarray(x)))
    np.testing.assert_allclose(max_rhat, rhat_j.max(), rtol=1e-6)
    np.testing.assert_allclose(min_ess, ess_j.min(), rtol=1e-5)


@pytest.mark.slow
def test_distributed_two_process_dryrun():
    """Process-spanning mesh smoke test: two CPU processes join through
    jax.distributed, run one sharded MCMC step over a 4-device global mesh,
    and must agree on the replicated checksum (VERDICT round 1 #8).
    Spawns subprocesses; the parent's jax state is untouched."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4, n_processes=2)  # raises on failure


def test_distributed_initialize_noop_single_process(monkeypatch):
    """Bare initialize() without args/env must be a harmless no-op."""
    from covid19uk_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed.initialize() is False
