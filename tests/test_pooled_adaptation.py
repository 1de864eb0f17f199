"""Pooled cross-chain adaptation test."""

import h5py
import numpy as np
import pytest

from tests.test_driver import make_synthetic_datafile


@pytest.mark.slow
def test_pooled_adaptation_shares_step_size(tmp_path, rng):
    from covid19uk_tpu.inference.driver import mcmc

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    mcmc(
        path,
        out,
        dict(
            dmax=4, nmax=8, m=2, occult_nmax=4, num_event_time_updates=2,
            num_bursts=1, num_burst_samples=5, thin=1, dtype="float64",
            seed=1, num_chains=2, pooled_adaptation=True,
            warmup=dict(first_window=6, slow_window=4, num_slow_windows=1,
                        last_window=4),
        ),
    )
    with h5py.File(out, "r") as f:
        ss = f["results/hmc/step_size"][:]
        # after the first window, step sizes start from the pooled value:
        # the first draw of the slow window must match across chains
        first_slow = ss[6]
        assert first_slow[0] == first_slow[1]
        # chains themselves still differ
        assert not np.array_equal(
            f["samples/psi"][:, 0], f["samples/psi"][:, 1]
        )
