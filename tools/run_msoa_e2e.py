"""MSOA-scale (M=7000) end-to-end pipeline run through the production CLIs.

The MSOA configuration (location-axis model scale, SURVEY.md §2.8 stretch)
is covered by sharding-parity tests and step benchmarks; this drives the
*actual CLI chain* at that scale on the TPU — synthetic gravity covariates
(tools/make_synthetic_data.py), assemble-format data file, inference with
the auto-selected block-sparse/banded/threaded-commute operators, thin,
and a 7-day in-sample prediction — and records wall-clock + sampler health
into docs/msoa_e2e.md.

R_t / within_between are *not* run at this scale: both materialize
[M, M] next-generation/pressure matrices per sample (reference design,
reproduction_number.py CHUNKSIZE loop) — ~196 MB per matrix at M=7000 —
which is a post-processing memory profile this host's single core cannot
sustain; they are exercised at NI/UK scale (docs/ni_production_run.md).

Usage: python tools/run_msoa_e2e.py [--workdir /tmp/msoa] [--locations 7000]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WARMUP = dict(first_window=200, slow_window=25, num_slow_windows=3,
              last_window=50)  # 425 warmup draws (store-size economy)


def run(tag, argv, timings):
    print(f"==== {tag}", flush=True)
    t0 = time.time()
    subprocess.run(argv, check=True, cwd=REPO)
    timings[tag] = round(time.time() - t0, 1)
    print(f"==== {tag} done in {timings[tag]}s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/msoa")
    p.add_argument("--locations", type=int, default=7000)
    p.add_argument("--bursts", type=int, default=20)
    p.add_argument("--out", default="docs/msoa_e2e.md")
    args = p.parse_args()

    import yaml

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    data_h5 = os.path.join(wd, "inferencedata.h5")
    post_h5 = os.path.join(wd, "posterior.h5")
    thin_pkl = os.path.join(wd, "thin.pkl")
    pred_nc = os.path.join(wd, "insample7.nc")
    cfg_path = os.path.join(wd, "config.yaml")

    cfg = {
        "Mcmc": dict(
            dmax=84, nmax=25, m=2, occult_nmax=15,
            num_event_time_updates=5, num_bursts=args.bursts,
            num_burst_samples=100, thin=100, num_chains=1,
            num_pair_updates=1, dtype="float32", seed=3,
            # warmup event draws are ~10 MB each at M=7000 — skip storing
            # them (4.3 GB + most of the HDF5 write wall otherwise)
            store_warmup=False,
            warmup=WARMUP,
        ),
        "ThinPosterior": dict(
            start=0, end=args.bursts, by=max(args.bursts // 5, 1)
        ),
    }
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    timings = {}
    py = [sys.executable]
    if not os.path.exists(data_h5):
        run("synthesize", py + ["tools/make_synthetic_data.py", data_h5,
                                "-M", str(args.locations), "-T", "120",
                                "--seed", "7"], timings)
    run("inference", py + ["-m", "covid19uk_tpu.inference.inference",
                           "-c", cfg_path, "-o", post_h5, data_h5], timings)
    run("thin", py + ["-m", "covid19uk_tpu.posterior.thin", post_h5,
                      "-c", cfg_path, "-o", thin_pkl], timings)
    run("predict", py + ["-m", "covid19uk_tpu.posterior.predict",
                         "-i", "-7", "-n", "7", data_h5, thin_pkl,
                         pred_nc], timings)

    import h5py

    with h5py.File(post_h5, "r") as f:
        n_rows = f["samples/gamma0"].shape[0]
        hmc_acc = float(np.asarray(f["results/hmc/is_accepted"][:]).mean())
        gamma0 = np.asarray(f["samples/gamma0"][:], np.float64)
        finite = bool(np.isfinite(gamma0).all())
    store_gb = os.path.getsize(post_h5) / 1e9
    total_draws = args.bursts * 100
    draws_per_sec = total_draws / timings["inference"]

    lines = [
        "# MSOA-scale end-to-end CLI run",
        "",
        f"M={args.locations} locations, T=120 days (synthetic gravity "
        "covariates at census-realistic sparsity), driven through the "
        "production CLIs on one TPU v5e chip: assemble-format data -> "
        "inference -> thin -> 7-day in-sample prediction.",
        "",
        f"- sampler: 1 chain x (425 warmup + {total_draws:,} draws), "
        "thin=100, store_warmup=False; block-sparse Cstar + banded CAR + "
        "threaded commute all auto-selected at this scale",
        f"- inference wall: **{timings['inference']}s** "
        f"({draws_per_sec:.1f} draws/sec end-to-end, including ETL load, "
        "operator build, compile, and HDF5 writes)",
        f"- HMC acceptance {hmc_acc:.3f}; all stored gamma0 draws finite: "
        f"{finite}",
        f"- posterior store: {store_gb:.2f} GB ({n_rows} thinned sampling "
        "rows; store_warmup=False — warmup events alone were 4.3 GB)",
        f"- stage walls: {json.dumps(timings)}",
        "",
        "R_t / within_between are exercised at NI/UK scale instead — both",
        "materialize [M, M] matrices per sample by design (reference",
        "reproduction_number.py), a post-processing profile this host",
        "cannot sustain at M=7000.",
        "",
        f"Reproduce: `python tools/run_msoa_e2e.py`",
        "",
    ]
    out = os.path.join(REPO, args.out)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}", flush=True)
    if not (finite and 0.2 < hmc_acc <= 1.0):
        sys.exit(1)


if __name__ == "__main__":
    main()
