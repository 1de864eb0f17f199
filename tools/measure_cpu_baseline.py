"""Measures the CPU baseline for bench.py on this machine.

Single chain (the reference's operating point), identical kernel
composition and problem size.  Result is recorded as
bench.CPU_BASELINE_CHAIN_STEPS_PER_SEC.
"""
import time
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
import bench


def main():
    fn, state, tune = bench.build(1)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    state, _ = fn(keys, state, tune)
    jax.block_until_ready(state)
    n = 10
    t0 = time.time()
    for i in range(n):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), 1)
        state, _ = fn(keys, state, tune)
    jax.block_until_ready(state)
    dt = time.time() - t0
    print(f"CPU single-chain: {n / dt:.3f} chain-steps/sec")


if __name__ == "__main__":
    main()
