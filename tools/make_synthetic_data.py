"""Generates a synthetic inferencedata file at arbitrary scale.

Writes the same ``constant_data`` / ``observations`` layout the assemble
CLI produces (reference ``data/assemble.py``), with gravity-model commuting
flows and kNN adjacency — the MSOA-scale (M ~ 7000) entry point for driving
the production inference CLI end-to-end without census-scale raw inputs.

    python tools/make_synthetic_data.py out.h5 --locations 7000 --days 120

Then:

    python -m covid19uk_tpu.inference.inference -c cfg.yaml -o post.h5 out.h5
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def make_datafile(path, M, T0, seed=0, radius_frac=0.05):
    from covid19uk_tpu.utils import ncio
    from covid19uk_tpu.utils.synthetic import gravity_flows, knn_adjacency

    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 1, size=(M, 2))
    N = np.clip(
        np.exp(rng.normal(np.log(1.0e4 if M > 1000 else 1.5e5), 0.5, M)),
        4e3, 1.2e6,
    )
    C = gravity_flows(rng, N, coords, radius_frac=radius_frac)
    dates = np.arange(
        np.datetime64("2021-01-01"), np.datetime64("2021-01-01") + T0
    )
    # endemic-ish case curve per location, scaled by population
    base = N * 2e-4
    cases = rng.poisson(
        base[:, None] * (1.0 + 0.3 * np.sin(np.arange(T0) / 9.0))[None, :]
    ).astype(float)
    constant = ncio.Group(
        variables=dict(
            C=C,
            W=np.ones(T0),
            N=N,
            adjacency=knn_adjacency(coords),
            weekday=(np.arange(T0) % 7 < 5).astype(float),
            area=rng.uniform(2e6, 5e8, size=M),
        ),
        coords=dict(location=np.array([f"L{i:05d}" for i in range(M)])),
    )
    obs = ncio.Group(
        variables=dict(cases=cases),
        coords=dict(time=dates),
        attrs=dict(origin=f"synthetic gravity M={M} seed={seed}"),
    )
    ncio.save_group(path, "constant_data", constant, mode="w")
    ncio.save_group(path, "observations", obs)
    return cases


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("output", help="output HDF5 path")
    p.add_argument("--locations", "-M", type=int, default=7000)
    p.add_argument("--days", "-T", type=int, default=120)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--radius-frac", type=float, default=0.05)
    a = p.parse_args()
    make_datafile(a.output, a.locations, a.days, a.seed, a.radius_frac)
    print(f"wrote {a.output}: M={a.locations}, T={a.days}")
