"""Headline benchmark: multi-chain MCMC throughput at full-UK scale.

Runs NCHAINS vmapped full MCMC transitions (16-leapfrog preconditioned HMC
over the 505-dim parameter vector + 5x multiscan of 4 event/occult kernels,
each requiring a full chain-binomial likelihood over the [380, 120, 3] event
tensor) and reports chain-steps per second on the current device.

The reference publishes no benchmark numbers (BASELINE.md), so the baseline
is *measured*: the identical JAX workload on this machine's CPU backend
(single chain, the reference's operating point) — see CPU_BASELINE below.

Prints exactly one JSON line:
  {"metric": "mcmc_chain_steps_per_sec_fulluk", "value": N,
   "unit": "chain-steps/sec", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

M, T = 380, 120  # full-UK problem scale (SURVEY.md §6)
NCHAINS = 64
N_ITERS = 40

# Measured on this machine's CPU backend (JAX 0.9.0, float32, single chain,
# same kernel composition; chains=1 matches the reference's single-chain
# design point): see tools/measure_cpu_baseline.py.
CPU_BASELINE_CHAIN_STEPS_PER_SEC = 1.9


def build(nchains, dtype_name="float32"):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    model = ge._build_model(M, T, dtype)
    single = ge._initial_chain_state(model)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (nchains,) + x.shape), single
    )
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
    )
    step = make_mcmc_step(model, 16, cfg)

    def many(keys, state, tune, model):
        return jax.vmap(step, in_axes=(0, 0, 0, None))(
            keys, state, tune, model
        )

    # model enters through the jit boundary as an argument (not a baked
    # constant): required for MSOA-scale problems where the covariate
    # matrices are hundreds of MB; bound outside jit for a 3-arg interface.
    jitted = jax.jit(many, donate_argnums=1)
    fn = lambda keys, state, tune: jitted(keys, state, tune, model)

    tune = HMCTunables(
        step_size=jnp.full((nchains,), 0.02, dtype),
        inv_mass_diag=jnp.ones((nchains,) + single.u.shape, dtype),
    )
    return fn, state, tune


def main():
    import jax

    fn, state, tune = build(NCHAINS)
    key = jax.random.PRNGKey(0)

    # warm up / compile
    keys = jax.random.split(key, NCHAINS)
    state, trace = fn(keys, state, tune)
    jax.block_until_ready(state)

    t0 = time.time()
    for i in range(N_ITERS):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), NCHAINS)
        state, trace = fn(keys, state, tune)
    jax.block_until_ready(state)
    dt = time.time() - t0

    value = N_ITERS * NCHAINS / dt
    print(
        json.dumps(
            {
                "metric": "mcmc_chain_steps_per_sec_fulluk",
                "value": round(value, 2),
                "unit": "chain-steps/sec",
                "vs_baseline": round(
                    value / CPU_BASELINE_CHAIN_STEPS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
