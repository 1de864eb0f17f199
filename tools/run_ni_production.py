"""Drive the full NI production pipeline end-to-end on the TPU.

assemble -> inference (4 chains x 1825 warmup + 5000 draws) -> thin ->
predict -> reproduction_number -> within_between, all through the same
``python -m`` CLIs a reference user would run
(/root/reference/README.md:28-40), then summarize into
docs/ni_production_run.md via tools/summarize_ni_run.py.

Usage: python tools/run_ni_production.py [--workdir ni_run] [--config ...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tag, argv, timings, cwd=REPO):
    print(f"==== {tag}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    subprocess.run(argv, check=True, cwd=cwd)
    timings[tag] = round(time.time() - t0, 1)
    print(f"==== {tag} done in {timings[tag]}s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="ni_run")
    p.add_argument("--config", default="data/ni_example/config.yaml")
    p.add_argument("--skip-summary", action="store_true")
    args = p.parse_args()

    wd = os.path.join(REPO, args.workdir)
    os.makedirs(wd, exist_ok=True)
    data_h5 = os.path.join(wd, "inferencedata.h5")
    post_h5 = os.path.join(wd, "posterior.h5")
    thin_pkl = os.path.join(wd, "thin_samples.pkl")
    pred_nc = os.path.join(wd, "insample7.nc")
    rt_nc = os.path.join(wd, "reproduction_number.nc")
    wb_csv = os.path.join(wd, "within_between.csv")

    py = [sys.executable, "-m"]
    timings = {}
    run("assemble", py + ["covid19uk_tpu.data.assemble", args.config, data_h5],
        timings)
    run("inference", py + ["covid19uk_tpu.inference.inference",
                           "-c", args.config, "-o", post_h5, data_h5],
        timings)
    run("thin", py + ["covid19uk_tpu.posterior.thin", post_h5,
                      "-c", args.config, "-o", thin_pkl], timings)
    # In-sample 7-day prediction from 7 days before the end (the reference
    # pipeline's insample runs, SURVEY.md §2.5).
    run("predict", py + ["covid19uk_tpu.posterior.predict",
                         "-i", "-7", "-n", "7", data_h5, thin_pkl, pred_nc],
        timings)
    run("rt", py + ["covid19uk_tpu.posterior.reproduction_number",
                    thin_pkl, "-d", data_h5, "-o", rt_nc], timings)
    run("within_between", py + ["covid19uk_tpu.posterior.within_between",
                                "-d", data_h5, "-s", thin_pkl, "-o", wb_csv],
        timings)

    with open(os.path.join(wd, "timings.json"), "w") as f:
        json.dump(timings, f, indent=1)
    print(json.dumps(timings))

    if not args.skip_summary:
        run("summary", [sys.executable, "tools/summarize_ni_run.py",
                        "--workdir", args.workdir, "--config", args.config],
            timings)


if __name__ == "__main__":
    main()
