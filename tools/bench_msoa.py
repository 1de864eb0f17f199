"""MSOA-scale (M ~ 7000) MCMC transition benchmark on the current device.

Round-1 measured 73 ms/step single-chain (dense everything, commute matvec
inside every leapfrog gradient).  This measures the round-2 stack: hoisted
commute, quadratic-form CAR prior, block-sparse Pallas operators.

    python tools/bench_msoa.py [M] [T] [chains] [sparse|dense] [radius_frac]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(M=7000, T=120, chains=1, mode="sparse", radius_frac=0.05,
         pair_updates=1):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from covid19uk_tpu.utils.synthetic import initial_chain_state
    from tools.profile_msoa import cached_model

    t0 = time.time()
    model = cached_model(
        M, T, radius_frac, jnp.float32,
        sparse=("auto" if mode == "sparse" else False),
    )
    print(f"model build: {time.time() - t0:.1f}s; "
          f"Cstar_bsr={'yes' if model.data.Cstar_bsr is not None else 'no'} "
          + (f"(density {model.data.Cstar_bsr.block_density:.3f})"
             if model.data.Cstar_bsr is not None else ""))
    single = initial_chain_state(model)
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
        num_pair_updates=pair_updates,
    )
    step = make_mcmc_step(model, 16, cfg)

    C = chains
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (C,) + x.shape), single
    )
    tune = HMCTunables(
        step_size=jnp.full((C,), 0.01, jnp.float32),
        inv_mass_diag=jnp.ones((C,) + single.u.shape, jnp.float32),
    )
    # model through the jit boundary: at MSOA scale baked-in covariates
    # overflow the remote-compile payload (CLAUDE.md).
    many = jax.jit(
        jax.vmap(step, in_axes=(0, 0, 0, None)), donate_argnums=1
    )
    def fence(x):
        # data-dependent scalar fetch: on axon, block_until_ready returns
        # before remote execution completes
        return float(np.asarray(jnp.sum(x[..., :4])))

    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    state, trace = many(keys, state, tune, model)
    fence(state.u)
    print(f"compile+first step: {time.time() - t0:.1f}s")

    n = 20
    t0 = time.time()
    for i in range(n):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), C)
        state, trace = many(keys, state, tune, model)
    fence(state.u)
    dt = (time.time() - t0) / n
    lp = float(np.asarray(trace.hmc.target_log_prob)[0])
    assert np.isfinite(lp), lp
    print(
        f"M={M} T={T} chains={C} mode={mode}: {dt * 1e3:.1f} ms/step "
        f"({C / dt:.1f} chain-steps/sec), logp={lp:.3g}"
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if len(a) > 0 else 7000,
        int(a[1]) if len(a) > 1 else 120,
        int(a[2]) if len(a) > 2 else 1,
        a[3] if len(a) > 3 else "sparse",
        float(a[4]) if len(a) > 4 else 0.05,
        int(a[5]) if len(a) > 5 else 1,
    )
