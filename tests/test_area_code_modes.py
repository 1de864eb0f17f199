"""AreaCodeData / CasesData input-mode coverage beyond csv."""

import json

import numpy as np
import pandas as pd
import pytest

from covid19uk_tpu.data.area_code import AreaCodeData
from covid19uk_tpu.data.case_data import CasesData


def test_area_codes_json_ons_format(tmp_path):
    """ONS ArcGIS JSON payload (the reference's json input mode)."""
    payload = {
        "features": [
            {"attributes": {"LAD19CD": "N09000001", "LAD19NM": "Antrim"}},
            {"attributes": {"LAD19CD": "N09000002", "LAD19NM": "Armagh"}},
            {"attributes": {"LAD19CD": "E09000001", "LAD19NM": "London"}},
        ]
    }
    path = tmp_path / "codes.json"
    path.write_text(json.dumps(payload))
    config = {
        "AreaCodeData": {
            "input": "json",
            "address": str(path),
            "format": "ons",
            "regions": ["N"],
        }
    }
    df = AreaCodeData.process(config)
    assert list(df["lad19cd"]) == ["N09000001", "N09000002"]  # E filtered
    assert config["lad19cds"] == ["N09000001", "N09000002"]


def test_area_codes_merging_dedup(tmp_path):
    """City of London / Westminster merge into one combined code."""
    payload = {
        "features": [
            {"attributes": {"LAD19CD": "E09000001", "LAD19NM": "City"}},
            {"attributes": {"LAD19CD": "E09000033", "LAD19NM": "Westminster"}},
            {"attributes": {"LAD19CD": "E06000001", "LAD19NM": "Hartlepool"}},
        ]
    }
    path = tmp_path / "codes.json"
    path.write_text(json.dumps(payload))
    config = {
        "AreaCodeData": {
            "input": "json",
            "address": str(path),
            "format": "ons",
            "regions": ["E"],
        }
    }
    df = AreaCodeData.process(config)
    assert list(df["lad19cd"]) == ["E09000001,E09000033", "E06000001"]


def test_cases_gov_format_fills_missing_zero(tmp_path, rng):
    """Missing (location, date) cells reindex to 0 (case_data.py:149-154)."""
    rows = [
        dict(areaCode="N09000001", date="2021-01-01",
             newCasesBySpecimenDate=5),
        dict(areaCode="N09000001", date="2021-01-03",
             newCasesBySpecimenDate=7),
        # N09000002 entirely missing
    ]
    path = tmp_path / "cases.csv"
    pd.DataFrame(rows).to_csv(path, index=False)
    config = {
        "date_range": ["2021-01-01", "2021-01-04"],
        "lad19cds": ["N09000001", "N09000002"],
        "CasesData": {
            "input": "csv",
            "address": str(path),
            "pillars": None,
            "measure": None,
            "format": "gov",
        },
    }
    ser = CasesData.process(config)
    arr = ser.unstack(level="time").to_numpy()
    np.testing.assert_array_equal(arr[0], [5.0, 0.0, 7.0])
    np.testing.assert_array_equal(arr[1], [0.0, 0.0, 0.0])


def test_unknown_input_mode_raises():
    with pytest.raises(NotImplementedError):
        AreaCodeData.get({"AreaCodeData": {"input": "carrier-pigeon"}})
