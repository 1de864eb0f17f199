"""One sharded multi-chain MCMC step on tiny shapes, over every visible
device — the shared body of ``__graft_entry__.dryrun_multichip`` (single
process, N virtual devices) and the multi-process distributed worker
(``python -m covid19uk_tpu.parallel.distributed``).

In multi-process mode ``jax.devices()`` is the *global* device list, so the
same code exercises a process-spanning mesh: chain-axis data parallelism x
location-axis sharding of the event tensor and commuting matmul
(SURVEY.md §2.8).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def run_sharded_step(n_devices=None):
    """Builds a tiny CovidUK model, jits one full sharded MCMC transition
    over a (chain, space) mesh of all (or ``n_devices``) global devices,
    executes it, and returns ``(checksum, info_str)``.

    The checksum is computed inside jit with a fully-replicated output
    sharding so every process holds (and can compare) the same value.
    """
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model as _build_model,
        initial_chain_state as _initial_chain_state,
    )

    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.parallel.mesh import chain_space_mesh
    from covid19uk_tpu.parallel.sharding import (
        make_sharded_step,
        shard_chain_state,
        tunables_shardings,
    )

    dtype = jnp.float32
    mesh = chain_space_mesh(n_devices)
    space = mesh.shape["space"]
    chains = mesh.shape["chain"] * 2  # 2 chains per chain-slice
    M, T = 8 * space, 8  # tiny; M divisible by the space axis

    model = _build_model(M, T, dtype)
    single = _initial_chain_state(model)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (chains,) + x.shape), single
    )

    cfg = EventKernelConfig(
        dmax=3, mmax=2, nmax=5, occult_nmax=3,
        num_event_time_updates=2, t_range=(T - 4, T),
    )
    step = make_mcmc_step(model, 4, cfg)

    sharded_step = make_sharded_step(step, mesh, shard_space=space > 1,
                                     donate=False)
    state = shard_chain_state(state, mesh, shard_space=space > 1)
    tu_sh = tunables_shardings(mesh)
    tune = HMCTunables(
        step_size=jax.device_put(
            jnp.full((chains,), 0.05, dtype), tu_sh.step_size
        ),
        inv_mass_diag=jax.device_put(
            jnp.ones((chains,) + single.u.shape, dtype), tu_sh.inv_mass_diag
        ),
    )
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), chains),
        NamedSharding(mesh, P("chain", None)),
    )

    new_state, trace = sharded_step(keys, state, tune)

    # Replicated reduction: every process reads the identical scalar.
    replicated = NamedSharding(mesh, P())
    summarize = jax.jit(
        lambda s, lp: (
            jnp.sum(s.u) + jnp.sum(s.events),
            jnp.all(jnp.isfinite(lp)),
        ),
        out_shardings=(replicated, replicated),
    )
    checksum, finite = summarize(new_state, trace.hmc.target_log_prob)
    jax.block_until_ready(checksum)
    assert bool(finite), "non-finite target_log_prob in sharded step"
    assert new_state.u.shape == (chains,) + single.u.shape
    info = (
        f"mesh={dict(mesh.shape)} chains={chains} M={M} T={T} "
        f"processes={jax.process_count()}"
    )
    return float(checksum), info
