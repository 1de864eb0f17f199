"""Sharded multi-chain MCMC over a device mesh.

Chain axis = data parallelism (each device advances its chains
independently; zero collectives in the transition itself).  Optional
``space`` axis = location-axis sharding of the event tensor and the
``Cstar @ (I/N)`` commuting matmul — XLA inserts the all-gather/reduce
collectives over ICI from the sharding annotations alone (the
scaling-book recipe: pick mesh, annotate, let XLA do the rest).

Pooled adaptation (within+between cross-chain variance pooling) lives in
the driver (``inference/driver.py``) at window granularity — the
functional upgrade of the reference's single-chain RunningVariance
(``inference.py:36-47``).
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from covid19uk_tpu.inference.gibbs import ChainState, HMCTunables


def chain_state_shardings(mesh, shard_space=False):
    """NamedShardings for a batched ChainState [C, ...]."""
    space = "space" if shard_space and "space" in mesh.axis_names else None
    return ChainState(
        u=NamedSharding(mesh, P("chain", None)),
        events=NamedSharding(mesh, P("chain", space, None, None)),
    )


def tunables_shardings(mesh):
    return HMCTunables(
        step_size=NamedSharding(mesh, P("chain")),
        inv_mass_diag=NamedSharding(mesh, P("chain", None)),
    )


def shard_chain_state(state: ChainState, mesh, shard_space=False):
    """Places a batched ChainState onto the mesh."""
    sh = chain_state_shardings(mesh, shard_space)
    return ChainState(
        u=jax.device_put(state.u, sh.u),
        events=jax.device_put(state.events, sh.events),
    )


def make_sharded_step(step_fn, mesh, shard_space=False, donate=True):
    """jits a vmapped MCMC transition with mesh shardings.

    Args:
      step_fn: single-chain ``(key, ChainState, HMCTunables) -> (state, trace)``.
      mesh: a Mesh with a ``chain`` axis (and optionally ``space``).
      shard_space: additionally shard the location axis of the event tensor.

    Returns:
      ``step(keys [C,2], state [C,...], tune [C,...]) -> (state, trace)``
      compiled with sharded inputs/outputs.
    """
    st_sh = chain_state_shardings(mesh, shard_space)
    tu_sh = tunables_shardings(mesh)
    key_sh = NamedSharding(mesh, P("chain", None))

    vstep = jax.vmap(step_fn)
    return jax.jit(
        vstep,
        in_shardings=(key_sh, st_sh, tu_sh),
        out_shardings=(st_sh, None),
        donate_argnums=(1,) if donate else (),
    )
