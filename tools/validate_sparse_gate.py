"""Validate the block-sparse auto-gate constants on REAL census flows.

The `ModelData.create(sparse="auto")` gate (models/spec.py) decides when
the Pallas block-ELL operator replaces the dense matmul.  Round 1-2 derived
its constants (M >= 1024, block density <= 0.3, and — after the batched
measurements — the chain-batch crossover) from gravity-model synthetic
flows only.  This tool grounds them in the real data:

1. **LAD scale (M=380, real matrix as-is).** Reads the real census
   commuting matrix (`/root/reference/data/mergedflows.csv`, the matrix
   the reference's ETL feeds the model — loaders.py:28-41) and reports its
   element/block density: the gate must (and does) choose DENSE here.

2. **MSOA scale (real-topology disaggregation).** The repo has no real
   MSOA-level flow file (the reference ships only LAD flows), so the
   MSOA-scale matrix is built by *disaggregating the real LAD matrix*:
   each LAD becomes ~pop/8000 MSOAs, each real LAD->LAD flow F_ab is
   split across randomly chosen (msoa_a, msoa_b) pairs, with the total
   number of nonzero OD pairs calibrated to the published 2011 census
   MSOA figure (~2.4M pairs over 7201 MSOAs => 0.46% element density).
   Unlike the gravity synthetics, the inter-block connectivity topology
   and the flow mass distribution are the real ones.

Prints the same dense-vs-sparse C-table as tools/bench_block_sparse.py on
the disaggregated matrix, plus the density report, so the gate constants
(M/density thresholds and the batch crossover) can be confirmed or
re-derived from real-structure measurements.

    python tools/validate_sparse_gate.py [--m 7000] [--t 120]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

FLOWS = "/root/reference/data/mergedflows.csv"
POPS = "/root/reference/data/c2019modagepop.csv"
CENSUS_MSOA_PAIRS = 2.4e6  # 2011 census MSOA OD pairs (England & Wales)
CENSUS_MSOA_COUNT = 7201


def load_lad_matrix():
    import pandas as pd

    flows = pd.read_csv(FLOWS)
    pops = pd.read_csv(POPS, index_col="lad19cd").sum(axis=1)
    codes = sorted(set(flows["From"]) | set(flows["To"]))
    idx = {c: i for i, c in enumerate(codes)}
    n = len(codes)
    F = np.zeros((n, n), np.float64)
    F[flows["From"].map(idx), flows["To"].map(idx)] = flows["Flow"]
    pop = pops.reindex(codes).fillna(pops.median()).to_numpy()
    return F, pop, codes


def disaggregate(F, pop, M_target, seed=0):
    """Splits the real LAD->LAD flows over synthetic MSOAs (see module doc).

    Host-frugal: emits one [M, M] float32 buffer (the from_dense input) and
    fills it in-place from COO triplets.
    """
    rng = np.random.default_rng(seed)
    n = len(pop)
    # MSOAs per LAD proportional to population, scaled to hit M_target
    raw = np.maximum(pop / pop.sum() * M_target, 1.0)
    counts = np.maximum(np.round(raw).astype(int), 1)
    while counts.sum() > M_target:
        counts[np.argmax(counts)] -= 1
    offsets = np.concatenate([[0], np.cumsum(counts)])
    M = int(offsets[-1])

    # target pair count scaled to the census density at this M
    density = CENSUS_MSOA_PAIRS / CENSUS_MSOA_COUNT**2
    total_pairs = density * M * M
    Fpos = np.where(F > 0, F, 0.0)
    share = Fpos / Fpos.sum()

    A = np.zeros((M, M), np.float32)
    src, dst = np.nonzero(Fpos)
    # number of MSOA pairs carrying each LAD pair's flow
    k = np.maximum(np.round(share[src, dst] * total_pairs).astype(int), 1)
    k = np.minimum(k, counts[src] * counts[dst])
    for a, b, kk in zip(src, dst, k):
        ia = rng.integers(offsets[a], offsets[a + 1], size=kk)
        ib = rng.integers(offsets[b], offsets[b + 1], size=kk)
        A[ia, ib] += np.float32(Fpos[a, b] / kk)
    return A, M


def bench_table(Cstar, T):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.ops.pallas.block_sparse import BlockSparse

    rng = np.random.default_rng(1)
    M = Cstar.shape[0]
    bs = BlockSparse.from_dense(Cstar, jnp.float32)
    print(
        f"M={M} element density={(Cstar != 0).mean():.4f} "
        f"block density={bs.block_density:.4f} "
        f"values={bs.values.size * 4 / 1e6:.1f} MB "
        f"(dense {M * M * 4 / 1e6:.1f} MB)"
    )
    dense = jnp.asarray(Cstar, jnp.float32)

    def timeit(f, *args, iters=50):
        float(jnp.sum(f(*args)))
        t0 = time.time()
        for _ in range(iters):
            out = f(*args)
        float(jnp.sum(out))
        return (time.time() - t0) / iters

    f_d = jax.jit(lambda a, x: a @ x)
    f_s = jax.jit(lambda b, x: b.matmul(x))
    x = jnp.asarray(rng.normal(size=(M, T)), jnp.float32)
    td, ts = timeit(f_d, dense, x), timeit(f_s, bs, x)
    print(
        f"unbatched: dense {td * 1e3:.3f} ms, bsr {ts * 1e3:.3f} ms "
        f"-> {td / ts:.2f}x"
    )
    f_db = jax.jit(lambda a, x: jnp.einsum("ij,cjt->cit", a, x))
    f_sb = jax.jit(jax.vmap(lambda b, x: b.matmul(x), in_axes=(None, 0)))
    print(f"{'C':>4} {'dense ms':>10} {'bsr ms':>10} {'speedup':>8}")
    for CC in (1, 2, 4, 8):
        xb = jnp.asarray(rng.normal(size=(CC, M, T)), jnp.float32)
        tdb, tsb = timeit(f_db, dense, xb), timeit(f_sb, bs, xb)
        print(
            f"{CC:>4} {tdb * 1e3:>10.3f} {tsb * 1e3:>10.3f} "
            f"{tdb / tsb:>7.2f}x"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=7000)
    ap.add_argument("--t", type=int, default=120)
    args = ap.parse_args()

    import jax.numpy as jnp

    from covid19uk_tpu.ops.pallas.block_sparse import BLOCK, BlockSparse

    F, pop, codes = load_lad_matrix()
    Cstar = F + F.T
    np.fill_diagonal(Cstar, 0.0)
    n = len(codes)
    bs_lad = BlockSparse.from_dense(
        Cstar.astype(np.float32), jnp.float32
    )
    print(
        f"REAL LAD matrix: M={n}, element density "
        f"{(Cstar != 0).mean():.3f}, block density "
        f"{bs_lad.block_density:.3f} -> auto-gate must pick DENSE "
        f"(M < 1024: {'OK' if n < 1024 else 'VIOLATED'}; density > 0.3: "
        f"{'OK' if bs_lad.block_density > 0.3 else 'VIOLATED'})"
    )

    print("\nDisaggregating real flows to MSOA scale...")
    t0 = time.time()
    A, M = disaggregate(F, pop, args.m)
    A = A + A.T  # symmetric Cstar shape, real topology
    print(f"built M={M} in {time.time() - t0:.1f}s")
    bench_table(A, args.t)


if __name__ == "__main__":
    main()
