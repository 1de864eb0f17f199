"""Benchmark: Pallas block-sparse matmul vs XLA dense at MSOA scale.

Measures the commuting coupling ``Cstar @ (I/N)`` — the hot op of the
spatial model (reference ``model_spec.py:262``) — at M ~ 7000 locations
with gravity-model flows (realistic sparsity), on the current default
device (the TPU under axon).

    python tools/bench_block_sparse.py [M] [T] [radius_frac]

The default radius_frac=0.05 gives ~0.8% element density at M=7000.  NB
the 2011 census MSOA commuting matrix is ~6x denser (~2.4M nonzero OD
pairs / 7201^2 = 4.6%) and its 128-block density saturates near 1.0 —
see tools/validate_sparse_gate.py for the real-topology measurement.

Prints per-variant wall times and the sparse-vs-dense speedup.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(M=7000, T=120, radius_frac=0.05):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.ops.pallas.block_sparse import BlockSparse
    from covid19uk_tpu.utils.synthetic import gravity_flows

    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 1, size=(M, 2))
    N = np.exp(rng.normal(np.log(8e3), 0.5, size=M))
    C = gravity_flows(rng, N, coords, radius_frac=radius_frac)
    np.fill_diagonal(C, 0.0)
    Cstar = C + C.T
    np.fill_diagonal(Cstar, -C.sum(axis=-2))

    elem_density = (Cstar != 0).mean()
    bs = BlockSparse.from_dense(Cstar, jnp.float32)
    print(
        f"M={M} T={T} element density={elem_density:.4f} "
        f"block density={bs.block_density:.4f} "
        f"values={bs.values.size * 4 / 1e6:.1f} MB "
        f"(dense: {M * M * 4 / 1e6:.1f} MB)"
    )

    dense = jnp.asarray(Cstar, jnp.float32)
    x = jnp.asarray(rng.normal(size=(M, T)), jnp.float32)

    f_dense = jax.jit(lambda a, x: a @ x)
    f_sparse = jax.jit(lambda bs, x: bs.matmul(x))  # bs is a pytree

    # check
    yd = f_dense(dense, x)
    ys = f_sparse(bs, x)
    err = float(jnp.max(jnp.abs(ys - yd)) / (jnp.max(jnp.abs(yd)) + 1e-30))
    print(f"max rel err sparse vs dense: {err:.2e}")

    def timeit(f, *args, iters=50):
        # fence via a data-dependent scalar fetch: on the axon backend
        # block_until_ready returns before remote execution completes
        float(jnp.sum(f(*args)))  # compile+warm
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        float(jnp.sum(out))
        return (time.time() - t0) / iters

    td = timeit(f_dense, dense, x)
    ts = timeit(f_sparse, bs, x)
    print(
        f"dense XLA:    {td * 1e3:8.3f} ms  "
        f"({2 * M * M * T / td / 1e12:.2f} TFLOP/s, "
        f"{M * M * 4 / td / 1e9:.0f} GB/s)"
    )
    print(f"pallas bsr:   {ts * 1e3:8.3f} ms")
    print(f"speedup: {td / ts:.2f}x")

    # batched (vmapped-chains) variants: one launch, trailing batch grid
    # axis with the value strip stationary per row (A-traffic paid once)
    f_dense_b = jax.jit(lambda a, x: jnp.einsum("ij,cjt->cit", a, x))
    f_sparse_b = jax.jit(
        jax.vmap(lambda bs, x: bs.matmul(x), in_axes=(None, 0))
    )
    print(f"{'C':>4} {'dense ms':>10} {'bsr ms':>10} {'speedup':>8}")
    for CC in (1, 2, 4, 8, 64):
        xb = jnp.asarray(rng.normal(size=(CC, M, T)), jnp.float32)
        tdb = timeit(f_dense_b, dense, xb)
        tsb = timeit(f_sparse_b, bs, xb)
        print(
            f"{CC:>4} {tdb * 1e3:>10.3f} {tsb * 1e3:>10.3f} "
            f"{tdb / tsb:>7.2f}x"
        )


if __name__ == "__main__":
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 7000
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    main(M, T, r)
