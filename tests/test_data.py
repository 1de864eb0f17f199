"""ETL layer tests: golden-file loaders against the reference's CSV
fixtures (read-only), synthetic gov-API case data, full assembly."""

import os

import numpy as np
import pandas as pd
import pytest

from covid19uk_tpu.data.loaders import (
    read_mobility,
    read_population,
    read_traffic_flow,
)
from covid19uk_tpu.data.util import merge_lad_codes, check_lad19cd_format
from covid19uk_tpu.data.assemble import assemble_data
from covid19uk_tpu.utils import ncio

REF_DATA = "/root/reference/data"
NI_CODES = [f"N090000{i:02d}" for i in range(1, 12)]

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures unavailable"
)


def write_area_codes_csv(path):
    pd.DataFrame(
        {"LAD19CD": NI_CODES, "LAD19NM": [f"NI {c}" for c in NI_CODES]}
    ).to_csv(path, index=False)


def write_cases_csv(path, rng, t0="2021-01-01", days=32):
    dates = pd.date_range(t0, periods=days)
    rows = []
    for c in NI_CODES:
        for d in dates:
            rows.append(
                dict(
                    areaCode=c,
                    date=str(d.date()),
                    newCasesBySpecimenDate=int(rng.poisson(25)),
                )
            )
    pd.DataFrame(rows).to_csv(path, index=False)


def ni_config(tmp_path, rng):
    cases_csv = str(tmp_path / "cases.csv")
    codes_csv = str(tmp_path / "codes.csv")
    write_cases_csv(cases_csv, rng)
    write_area_codes_csv(codes_csv)
    return {
        "date_range": ["2021-01-01", "2021-02-02"],
        "mobility_matrix": f"{REF_DATA}/mergedflows.csv",
        "population_size": f"{REF_DATA}/c2019modagepop.csv",
        "commute_volume": None,
        "CasesData": {
            "input": "csv",
            "address": cases_csv,
            "pillars": None,
            "measure": None,
            "format": "gov",
        },
        "AreaCodeData": {
            "input": "csv",
            "address": codes_csv,
            "format": "ons",
            "regions": ["N"],
        },
    }


def test_merge_lad_codes():
    s = pd.Series(["E09000001", "E09000033", "E06000052", "N09000001"])
    merged = merge_lad_codes(s)
    assert merged[0] == merged[1] == "E09000001,E09000033"
    assert merged[2] == "E06000052,E06000053"
    assert merged[3] == "N09000001"
    check_lad19cd_format(pd.DataFrame({"lad19cd": merged}))


@needs_ref
def test_read_mobility_ni():
    mat, codes = read_mobility(f"{REF_DATA}/mergedflows.csv", NI_CODES)
    assert codes == NI_CODES
    assert mat.shape == (11, 11)
    assert mat.min() >= 0
    # spot value from the raw file: Flow 107 From N09000001 To N09000011
    raw = pd.read_csv(f"{REF_DATA}/mergedflows.csv")
    want = raw[(raw.From == "N09000001") & (raw.To == "N09000011")].Flow.sum()
    i, j = codes.index("N09000011"), codes.index("N09000001")
    assert mat[i, j] == want  # [dest, src]


@needs_ref
def test_read_population_ni():
    pop, codes = read_population(f"{REF_DATA}/c2019modagepop.csv", NI_CODES)
    assert codes == NI_CODES
    raw = pd.read_csv(f"{REF_DATA}/c2019modagepop.csv", index_col="lad19cd")
    want = raw.loc["N09000001"].sum()
    assert pop[0] == want
    assert (pop > 10000).all()


def test_read_traffic_flow_none_gives_ones():
    flow, dates = read_traffic_flow(
        None, np.datetime64("2021-01-01"), np.datetime64("2021-02-02")
    )
    assert flow.shape == (32,)
    np.testing.assert_array_equal(flow, 1.0)
    assert dates[0] == np.datetime64("2021-01-01")


def test_read_traffic_flow_csv_clamps_span(tmp_path):
    """Dates outside the observed span clamp to the first/last observation;
    missing dates inside the span stay NaN (reference loaders.py:75-91)."""
    csv = tmp_path / "flow.csv"
    pd.DataFrame(
        {"Date": ["2021-01-03", "2021-01-05"], "Cars": [80.0, 120.0]}
    ).to_csv(csv, index=False)
    flow, dates = read_traffic_flow(
        str(csv), np.datetime64("2021-01-01"), np.datetime64("2021-01-08")
    )
    assert flow.shape == (7,)
    np.testing.assert_allclose(flow[:3], 0.8)  # clamped + observed
    assert np.isnan(flow[3])  # in-span gap stays NaN
    np.testing.assert_allclose(flow[4:], 1.2)  # observed + clamped


@needs_ref
def test_assemble_ni_example(tmp_path, rng):
    """Full offline assembly of the NI example; output consumable by mcmc."""
    config = ni_config(tmp_path, rng)
    out = str(tmp_path / "inferencedata.h5")
    constant, obs = assemble_data(out, config)

    g = ncio.load_group(out, "constant_data")
    assert g["C"].shape == (11, 11)
    assert g["N"].shape == (11,)
    assert g["W"].shape == (32,)
    assert g["weekday"].shape == (32,)
    assert g["adjacency"].shape == (11, 11)
    # adjacency symmetric, zero-diagonal, no isolated nodes
    np.testing.assert_array_equal(g["adjacency"], g["adjacency"].T)
    assert np.trace(g["adjacency"]) == 0
    assert (g["adjacency"].sum(-1) > 0).all()
    # weekday: 2021-01-01 was a Friday, 2021-01-02 Saturday
    assert g["weekday"][0] == 1.0 and g["weekday"][1] == 0.0

    o = ncio.load_group(out, "observations")
    assert o["cases"].shape == (11, 32)
    assert o.coords["time"].dtype.kind == "M"


@needs_ref
@pytest.mark.slow
def test_assemble_then_mcmc(tmp_path, rng):
    """The assembled NI file drives the inference end-to-end."""
    from covid19uk_tpu.inference.driver import mcmc

    config = ni_config(tmp_path, rng)
    data_path = str(tmp_path / "inferencedata.h5")
    assemble_data(data_path, config)

    post = str(tmp_path / "posterior.h5")
    mcmc(
        data_path,
        post,
        dict(
            dmax=5, nmax=10, m=2, occult_nmax=5, num_event_time_updates=2,
            num_bursts=1, num_burst_samples=5, thin=1, seed=1,
            warmup=dict(first_window=6, slow_window=4, num_slow_windows=1,
                        last_window=4),
        ),
    )
    import h5py

    with h5py.File(post, "r") as f:
        assert f["samples/seir"].shape[1:] == (11, 32, 3)
        assert np.isfinite(f["samples/psi"][:]).all()
