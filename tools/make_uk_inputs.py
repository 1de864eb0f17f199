"""Generate full-UK real-census inputs for the headline benchmark.

VERDICT r03 item 6: the headline min-ESS/sec has only ever been measured
on gravity-model synthetic covariates; real LAD topology behaves
differently (tools/validate_sparse_gate.py).  This tool assembles a
full-UK (~380 LAD) `inferencedata.h5` from the REAL census fixtures —
`/root/reference/data/mergedflows.csv` commuting flows and
`c2019modagepop.csv` mid-2019 population (reference problem scale,
doc/lancs_space_model_concept.tex:47,76,170-174) — with a case series
simulated from the model at the NI-run truth values (no network egress, so
real case counts are unavailable; the covariate topology is what the
benchmark needs to be real).

Outputs (under data/uk_example/):
  areacodes.json     ONS-format LAD19 feature list (all UK nations)
  cases.csv          gov-API-format simulated case frame
  truth.json         simulating parameter values + seed
  config.yaml        ProcessData config for `python -m ...data.assemble`
  inferencedata.h5   the assembled file (netCDF4 profile)

Usage: python tools/make_uk_inputs.py [--outdir data/uk_example]
       [--alpha0 -1.4]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/data"
DATE_LOW = np.datetime64("2021-01-01")
DATE_HIGH = np.datetime64("2021-02-02")  # overridden by --days


def process_config(outdir):
    return {
        "date_range": [str(DATE_LOW), str(DATE_HIGH)],
        "mobility_matrix": os.path.join(REF_DATA, "mergedflows.csv"),
        "population_size": os.path.join(REF_DATA, "c2019modagepop.csv"),
        "commute_volume": None,
        "CasesData": {
            "input": "csv",
            "address": os.path.join(outdir, "cases.csv"),
            "pillars": None,
            "measure": None,
            "format": "gov",
        },
        "AreaCodeData": {
            "input": "json",
            "address": os.path.join(outdir, "areacodes.json"),
            "format": "ons",
            "regions": ["E", "W", "S", "N"],
        },
    }


def main(outdir, alpha0, days):
    global DATE_HIGH
    DATE_HIGH = DATE_LOW + np.timedelta64(int(days), "D")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import pandas as pd

    from covid19uk_tpu.data.assemble import assemble_data, gather_data
    from covid19uk_tpu.data.util import merge_lad_codes
    from covid19uk_tpu.models.spec import CovidUK, ModelData, Parameters

    os.makedirs(outdir, exist_ok=True)

    # ---- area codes: every LAD present in BOTH fixtures -------------------
    flows = pd.read_csv(os.path.join(REF_DATA, "mergedflows.csv"))
    pop = pd.read_csv(os.path.join(REF_DATA, "c2019modagepop.csv"))
    flow_codes = set(merge_lad_codes(pd.Series(sorted(
        set(flows["From"]) | set(flows["To"])
    ))))
    pop_codes = set(merge_lad_codes(pop["lad19cd"]))
    codes = sorted(flow_codes & pop_codes)
    features = [
        {"attributes": {"LAD19CD": c, "LAD19NM": f"UK LAD {c}"}}
        for c in codes
    ]
    with open(os.path.join(outdir, "areacodes.json"), "w") as f:
        json.dump({"features": features}, f)
    print(f"areacodes.json: {len(codes)} LADs "
          f"(flows {len(flow_codes)}, population {len(pop_codes)})")

    # ---- covariates via the production ETL (zero-case placeholder) -------
    pd.DataFrame(
        columns=["areaCode", "date", "newCasesBySpecimenDate"]
    ).to_csv(os.path.join(outdir, "cases.csv"), index=False)
    config = process_config(outdir)
    constant, _ = gather_data(config)
    lads = [c.decode() for c in constant.coords["location"]]

    # ---- simulate at the NI-run truth values ------------------------------
    with open("data/ni_example/truth.json") as f:
        truth = json.load(f)
    truth["alpha_0"] = float(alpha0)
    truth["sim_seed"] = 1042

    data = ModelData.create(constant.variables, jnp.float64, sparse=False)
    M = data.num_locations
    T = int((DATE_HIGH - DATE_LOW).astype(int))
    N = np.asarray(data.N)
    e0 = np.maximum(5.0, np.round(N * 2e-4))
    i0 = np.maximum(5.0, np.round(N * 2e-4))
    init = np.stack([N - e0 - i0, e0, i0, np.zeros(M)], -1)
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    params = Parameters(
        psi=jnp.float64(truth["psi"]),
        sigma_space=jnp.float64(truth["sigma_space"]),
        beta_area=jnp.float64(truth["beta_area"]),
        gamma0=jnp.float64(truth["gamma0"]),
        gamma1=jnp.float64(truth["gamma1"]),
        alpha_0=jnp.float64(truth["alpha_0"]),
        alpha_t=jnp.zeros(T - 1, jnp.float64),
        spatial_effect=jnp.zeros(M, jnp.float64),
    )
    events = np.asarray(jax.jit(model.sample_seir)(
        jax.random.PRNGKey(truth["sim_seed"]), params
    ))
    cases = events[..., 2]
    daily = cases.sum(0)
    frac = cases.sum() / N.sum()
    print(f"simulated daily UK cases: min {daily.min():.0f} "
          f"max {daily.max():.0f} total {daily.sum():.0f} "
          f"({100*frac:.2f}% of population)")
    if daily.sum() < 5000:
        raise SystemExit("epidemic died out — raise --alpha0")
    if frac > 0.2:
        raise SystemExit("epidemic exploded — lower --alpha0")

    dates = np.arange(DATE_LOW, DATE_HIGH)
    rows = [
        (code, str(d), cases[m, t])
        for m, code in enumerate(lads)
        for t, d in enumerate(dates)
    ]
    pd.DataFrame(
        rows, columns=["areaCode", "date", "newCasesBySpecimenDate"]
    ).to_csv(os.path.join(outdir, "cases.csv"), index=False)
    with open(os.path.join(outdir, "truth.json"), "w") as f:
        json.dump(truth, f, indent=1)

    # ---- final assemble with the real cases -------------------------------
    out_h5 = os.path.join(outdir, "inferencedata.h5")
    assemble_data(out_h5, config)
    print(f"wrote {out_h5}")

    import yaml

    with open(os.path.join(outdir, "config.yaml"), "w") as f:
        yaml.safe_dump({"ProcessData": config}, f)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="data/uk_example")
    p.add_argument("--alpha0", type=float, default=-1.0)
    p.add_argument("--days", type=int, default=120,
                   help="window length (120 matches the synthetic headline "
                   "bench scale; the reference's own full-model windows are "
                   "~3 months)")
    main(**vars(p.parse_args()))
