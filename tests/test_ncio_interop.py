"""netCDF-4 profile interop (VERDICT r03 item 5).

netCDF4-c / h5netcdf / xarray are not installable here (no egress), so a
live round-trip cannot run; instead every file the pipeline writes is
checked by a CLEAN-ROOM validator of the documented netCDF-4 enhanced
format (tools/nc4_validate.py — raw h5py attribute/reference checks
written against the public format spec, no covid19uk_tpu imports), which
verifies exactly the structures the real readers consume: dimension
scales, NAME conventions, DIMENSION_LIST attachments, REFERENCE_LIST
back-pointers, _Netcdf4Dimid bookkeeping, and the _NCProperties stamp.
"""

import os

import numpy as np
import pytest

from covid19uk_tpu.utils import ncio
from tools.nc4_validate import validate_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fresh_write_conforms(tmp_path, rng):
    """A Group written by ncio.save_group passes the spec validator."""
    path = str(tmp_path / "pred.nc")
    ev = rng.poisson(3.0, size=(7, 4, 10, 3)).astype(float)
    dates = np.arange(
        np.datetime64("2021-02-01"), np.datetime64("2021-02-11")
    )
    g = ncio.Group(
        variables=dict(events=ev),
        dims=dict(events=("iteration", "location", "time", "event")),
        coords=dict(
            time=dates, location=np.array([f"L{i}" for i in range(4)])
        ),
        attrs=dict(origin="test"),
    )
    ncio.save_group(path, "predictions", g, mode="w")
    errors = validate_file(path)
    assert errors == [], errors


def test_multi_group_file_conforms(tmp_path, rng):
    """Two groups in one file (the assemble layout: constant_data +
    observations) both conform, with independent dimids."""
    path = str(tmp_path / "data.nc")
    M, T = 5, 9
    const = ncio.Group(
        variables=dict(
            C=rng.uniform(0, 10, (M, M)),
            N=rng.uniform(1e4, 1e5, M),
            W=np.ones(T),
            adjacency=np.eye(M),
            weekday=(np.arange(T) % 7 < 5).astype(float),
            area=rng.uniform(1e8, 1e9, M),
        ),
        dims=dict(
            C=("location", "location_dest"), N=("location",), W=("time",),
            adjacency=("location", "location_dest"), weekday=("time",),
            area=("location",),
        ),
        coords=dict(location=np.array([f"L{i}" for i in range(M)])),
    )
    obs = ncio.Group(
        variables=dict(cases=rng.poisson(5.0, (M, T)).astype(float)),
        dims=dict(cases=("location", "time")),
        coords=dict(
            location=np.array([f"L{i}" for i in range(M)]),
            time=np.arange(
                np.datetime64("2021-01-01"), np.datetime64("2021-01-10")
            ),
        ),
    )
    ncio.save_group(path, "constant_data", const, mode="w")
    ncio.save_group(path, "observations", obs, mode="a")
    errors = validate_file(path)
    assert errors == [], errors
    # and ncio reads its own profile back
    back = ncio.load_group(path, "observations")
    np.testing.assert_allclose(back["cases"], obs["cases"])
    assert back.dims["cases"] == ("location", "time")


def test_validator_catches_violations(tmp_path):
    """The validator is not a rubber stamp: structurally broken files are
    flagged (missing DIMENSION_LIST, length-mismatched scale, missing
    back-pointer)."""
    import h5py

    path = str(tmp_path / "broken.nc")
    with h5py.File(path, "w") as f:
        g = f.create_group("g")
        # variable with no DIMENSION_LIST at all
        g.create_dataset("orphan", data=np.zeros((3, 2)))
        # scale with a wrong-length phony NAME
        s = g.create_dataset("dim0", shape=(4,), dtype="f4")
        s.make_scale(
            "This is a netCDF dimension but not a netCDF variable. 7"
        )
    errors = validate_file(path)
    assert any("orphan" in e and "DIMENSION_LIST" in e for e in errors)
    assert any("phony NAME length" in e for e in errors)
    assert any("_NCProperties" in e for e in errors)
    assert any("_Netcdf4Dimid" in e for e in errors)


@pytest.mark.parametrize(
    "artifact",
    ["ni_run/inferencedata.h5", "ni_run/insample7.nc",
     "ni_run/reproduction_number.nc"],
)
def test_production_artifacts_conform(artifact):
    """The committed NI production artifacts pass the spec validator."""
    path = os.path.join(REPO, artifact)
    if not os.path.exists(path):
        pytest.skip(f"{artifact} not present")
    errors = validate_file(path)
    assert errors == [], errors
