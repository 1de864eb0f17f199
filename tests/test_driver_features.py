"""Driver feature tests: multi-chain layout, checkpoint/resume, diagnostics."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_driver import make_synthetic_datafile


def _cfg(**kw):
    base = dict(
        dmax=4, nmax=8, m=2, occult_nmax=4, num_event_time_updates=2,
        num_bursts=2, num_burst_samples=5, thin=1, dtype="float64", seed=1,
        warmup=dict(first_window=6, slow_window=4, num_slow_windows=1,
                    last_window=4),
    )
    base.update(kw)
    return base


@pytest.mark.slow
def test_multichain_layout_and_thin(tmp_path, rng):
    from covid19uk_tpu.inference.driver import mcmc
    from covid19uk_tpu.posterior.thin import thin_posterior
    import h5py

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    mcmc(path, out, _cfg(num_chains=2))

    total = 6 + 4 + 4 + 10
    with h5py.File(out, "r") as f:
        assert f["samples/psi"].shape == (total, 2)
        assert f["samples/seir"].shape == (total, 2, 3, 25, 3)
        assert f["results/hmc/is_accepted"].shape == (total, 2)
        assert f["results/move/S->E/proposed_delta"].shape == (total, 2, 4, 2)
        assert f["results/occult/S->E/proposed_delta"].shape == (total, 2, 4)
        # chains must differ (independent randomness)
        assert not np.array_equal(
            f["samples/psi"][:, 0], f["samples/psi"][:, 1]
        )

    # thinning folds the chain axis into iterations
    pklf = str(tmp_path / "s.pkl")
    d = thin_posterior(out, pklf, dict(start=0, end=total, by=1))
    assert d["seir"].shape == (total * 2, 3, 25, 3)
    assert d["psi"].shape == (total * 2,)


@pytest.mark.slow
def test_checkpoint_resume(tmp_path, rng):
    """Killing after burst k and re-running resumes from burst k."""
    from covid19uk_tpu.inference.driver import mcmc
    import h5py

    path = str(tmp_path / "data.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    ckpt = str(tmp_path / "ck.npz")

    out1 = str(tmp_path / "p1.h5")
    mcmc(path, out1, _cfg(num_bursts=4, checkpoint=ckpt))

    # re-run: checkpoint says all bursts done -> no sampling work repeated,
    # but the posterior file must still be complete for the warmup part
    out2 = str(tmp_path / "p2.h5")
    mcmc(path, out2, _cfg(num_bursts=4, checkpoint=ckpt))
    with h5py.File(out2, "r") as f:
        # warmup section written; burst section skipped (resumed past it)
        total_warm = 6 + 4 + 4
        assert np.isfinite(f["samples/psi"][:total_warm]).all()


def test_jump_summary_and_p_null(tmp_path, rng):
    from covid19uk_tpu.inference.driver import mcmc
    from covid19uk_tpu.utils.diagnostics import jump_summary, mean_sojourn

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    mcmc(path, out, _cfg())
    js = jump_summary(out)
    for k in ["S->E", "E->I"]:
        assert 0 <= js[k]["accept"] <= 1
        assert np.isfinite(js[k]["sjd"])

    # mean sojourn on a simple deterministic example: in 10 at t=0,
    # out 10 at t=1 -> everyone stays exactly 1 step
    in_ev = np.zeros((1, 5)); in_ev[0, 0] = 10
    out_ev = np.zeros((1, 5)); out_ev[0, 1] = 10
    ms = mean_sojourn(in_ev, out_ev, np.zeros(1))
    assert ms == pytest.approx(2.0)  # 1 + total_state/total_events


def test_regularize_occults_repairs_negative_state(rng):
    from covid19uk_tpu.utils.diagnostics import regularize_occults
    from covid19uk_tpu.models import seir

    M, T = 2, 6
    init = np.array([[100.0, 5.0, 5.0, 0.0]] * M)
    events = np.zeros((M, T, 3))
    events[:, 1, 0] = 3.0
    occults = np.zeros((M, T, 3))
    occults[0, 2, 1] = 50.0  # way more E->I than E present
    state, fixed = regularize_occults(events, occults, init)
    assert state.min() >= 0
    assert fixed[0, 2, 1] < 50.0
