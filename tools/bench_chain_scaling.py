"""Chain-scaling study — profile lever (c) from docs/profile_uk.md.

The round-4 roofline put the full-UK step at 39% of HBM bandwidth with
64 chains: ESS/sec should scale nearly linearly in chains until the chip
saturates.  This tool runs the EXACT headline methodology (bench.py:
400-draw adaptation, 3 x 1000 timed draws, pooled min-scalar ESS) at
several chain counts in ONE session, so the remote-tunnel wall variance
(~2x between sessions) cancels and the ratios are trustworthy.

    python tools/bench_chain_scaling.py [64 128 256]

Prints one JSON line per chain count (bench.py schema, metric
``ess_per_sec_fulluk_c{C}``) plus a final summary line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    chain_counts = [int(c) for c in (sys.argv[1:] or ["64", "128", "256"])]
    results = []
    for C in chain_counts:
        r = bench.run_benchmark(
            *bench.build(C), metric=f"ess_per_sec_fulluk_c{C}"
        )
        print(json.dumps(r), flush=True)
        results.append(r)
    best = max(results, key=lambda r: r["value"])
    print(json.dumps({
        "metric": "chain_scaling_best",
        "chains": best["chains"],
        "value": best["value"],
        "scaling": {
            str(r["chains"]): round(r["value"] / results[0]["value"], 2)
            for r in results
        },
    }))


if __name__ == "__main__":
    main()
