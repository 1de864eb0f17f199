"""Measures the frozen CPU baseline for bench.py on this machine.

Runs the FROZEN naive-v1 sampler (``tools/naive_v1.py``: full-likelihood
re-evaluation everywhere, single chain — the TF reference's evaluation
strategy and operating point) at full-UK scale on the CPU backend.  The
result is recorded as ``bench.CPU_BASELINE_NAIVE_STEPS_PER_SEC`` and is
reproducible at any commit because the naive implementation is vendored
and never optimized.

    python tools/measure_cpu_baseline.py [n_steps]
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")


def main(n=20):
    import jax.numpy as jnp

    import bench
    from covid19uk_tpu.inference.gibbs import EventKernelConfig, HMCTunables
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )
    from tools.naive_v1 import make_naive_step

    M, T = bench.M, bench.T
    model = build_synthetic_model(M, T, jnp.float32, sparse=False)
    state = initial_chain_state(model)
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
    )
    step = jax.jit(make_naive_step(model, 16, cfg))
    tune = HMCTunables(
        step_size=jnp.asarray(0.02, jnp.float32),
        inv_mass_diag=jnp.ones_like(state.u),
    )
    state = step(jax.random.PRNGKey(0), state, tune)  # compile + warm
    jax.block_until_ready(state.u)
    t0 = time.time()
    for i in range(n):
        state = step(jax.random.PRNGKey(i + 1), state, tune)
    jax.block_until_ready(state.u)
    dt = time.time() - t0
    print(
        f"CPU naive-v1 single-chain (M={M}, T={T}): "
        f"{n / dt:.4f} chain-steps/sec ({dt / n:.3f} s/step over {n} steps)"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
