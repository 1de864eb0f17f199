"""Generate the offline inputs for the Northern-Ireland production run.

The reference's documented acceptance run is the NI example
(/root/reference/README.md:28-40, example_config.yaml): real census
commuting flows + mid-2019 population, one month of daily case counts from
the gov API.  This environment has no network egress, so the real covariates
come from the committed fixtures (/root/reference/data/mergedflows.csv,
c2019modagepop.csv) and the *case series* is simulated from the model
itself at documented parameter values — which upgrades the run from a
smoke test to a calibration check: the posterior must cover the simulating
parameters.

Outputs (under data/ni_example/):
  areacodes.json  ONS-format LAD19 feature list for the N* codes
  cases.csv       gov-API-format frame (areaCode, date, newCasesBySpecimenDate)
  truth.json      the simulating parameter values + seed

Usage: python tools/make_ni_inputs.py [--outdir data/ni_example]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/data"
DATE_LOW = np.datetime64("2021-01-01")
DATE_HIGH = np.datetime64("2021-02-02")

# Simulating values: psi/gamma0 at the recovery-test operating point
# (tests/test_recovery.py TRUE); alpha_0 tuned so the NI epidemic neither
# explodes nor dies over the month at the real flow magnitudes.
TRUTH = dict(
    psi=0.4,
    sigma_space=0.1,
    beta_area=0.0,
    gamma0=float(np.log(0.45)),
    gamma1=0.0,
    alpha_0=-1.0,
    sim_seed=42,
)


def main(outdir):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from covid19uk_tpu.data.assemble import gather_data
    from covid19uk_tpu.models.spec import CovidUK, ModelData, Parameters

    os.makedirs(outdir, exist_ok=True)

    # ---- area codes: every N09* LAD present in the real flows ------------
    import pandas as pd

    flows = pd.read_csv(os.path.join(REF_DATA, "mergedflows.csv"))
    codes = sorted(set(flows["From"]) | set(flows["To"]))
    ni_codes = [c for c in codes if c.startswith("N")]
    features = [
        {"attributes": {"LAD19CD": c, "LAD19NM": f"NI LAD {c[-2:]}"}}
        for c in ni_codes
    ]
    areacodes_path = os.path.join(outdir, "areacodes.json")
    with open(areacodes_path, "w") as f:
        json.dump({"features": features}, f, indent=1)
    print(f"{areacodes_path}: {len(ni_codes)} LADs")

    # ---- covariates via the production ETL (zero-case placeholder) -------
    cases_path = os.path.join(outdir, "cases.csv")
    pd.DataFrame(
        columns=["areaCode", "date", "newCasesBySpecimenDate"]
    ).to_csv(cases_path, index=False)
    config = _process_config(outdir)
    constant, _ = gather_data(config)
    mob_codes = [c.decode() for c in constant.coords["location"]]

    # ---- simulate the epidemic at TRUTH -----------------------------------
    data = ModelData.create(constant.variables, jnp.float64)
    M = data.num_locations
    T = int((DATE_HIGH - DATE_LOW).astype(int))
    N = np.asarray(data.N)
    # Seed ~2/10k exposed + infectious per LAD (NI January-2021-like load).
    e0 = np.maximum(5.0, np.round(N * 2e-4))
    i0 = np.maximum(5.0, np.round(N * 2e-4))
    init = np.stack([N - e0 - i0, e0, i0, np.zeros(M)], -1)
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    params = Parameters(
        psi=jnp.float64(TRUTH["psi"]),
        sigma_space=jnp.float64(TRUTH["sigma_space"]),
        beta_area=jnp.float64(TRUTH["beta_area"]),
        gamma0=jnp.float64(TRUTH["gamma0"]),
        gamma1=jnp.float64(TRUTH["gamma1"]),
        alpha_0=jnp.float64(TRUTH["alpha_0"]),
        alpha_t=jnp.zeros(T - 1, jnp.float64),
        spatial_effect=jnp.zeros(M, jnp.float64),
    )
    events = np.asarray(
        model.sample_seir(jax.random.PRNGKey(TRUTH["sim_seed"]), params)
    )
    cases = events[..., 2]  # observed = I->R removals (reference semantics)
    daily = cases.sum(0)
    print(f"simulated daily cases: min {daily.min():.0f} max {daily.max():.0f} "
          f"total {daily.sum():.0f}")
    if daily.sum() < 500:
        raise SystemExit("epidemic died out — retune alpha_0")

    # ---- write the gov-format frame ---------------------------------------
    dates = np.arange(DATE_LOW, DATE_HIGH)
    rows = []
    for m, code in enumerate(mob_codes):
        for t, d in enumerate(dates):
            rows.append((code, str(d), cases[m, t]))
    pd.DataFrame(
        rows, columns=["areaCode", "date", "newCasesBySpecimenDate"]
    ).to_csv(cases_path, index=False)
    print(f"{cases_path}: {len(rows)} rows")

    with open(os.path.join(outdir, "truth.json"), "w") as f:
        json.dump(TRUTH, f, indent=1)


def _process_config(outdir):
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
            "regions": ["N"],
        },
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="data/ni_example")
    main(p.parse_args().outdir)
