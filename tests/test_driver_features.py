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
def test_write_thin_stores_every_nth_draw(tmp_path, rng):
    """Mcmc thin > 1 stores every thin-th sampling draw (warmup in full):
    same seeds => the thinned store equals the strided slice of the
    unthinned one."""
    import h5py

    from covid19uk_tpu.inference.driver import mcmc

    path = str(tmp_path / "data.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    warm = 6 + 4 + 4

    full = str(tmp_path / "full.h5")
    mcmc(path, full, _cfg(num_bursts=2, num_burst_samples=6, thin=1))
    thinned = str(tmp_path / "thin.h5")
    mcmc(path, thinned, _cfg(num_bursts=2, num_burst_samples=6, thin=3))

    with h5py.File(full, "r") as a, h5py.File(thinned, "r") as b:
        assert b["samples/psi"].shape == (warm + 4,)
        np.testing.assert_array_equal(
            a["samples/psi"][:warm], b["samples/psi"][:warm]
        )
        np.testing.assert_array_equal(
            a["samples/psi"][warm + 2 :: 3], b["samples/psi"][warm:]
        )
        np.testing.assert_array_equal(
            a["samples/seir"][warm + 2 :: 3], b["samples/seir"][warm:]
        )


@pytest.mark.slow
def test_checkpoint_resume(tmp_path, rng):
    """Killing mid-run and re-running resumes into the SAME posterior file
    without truncating, completing the remaining bursts."""
    import h5py

    from covid19uk_tpu.inference.driver import mcmc
    from covid19uk_tpu.utils import checkpoint as ckpt_mod

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    ckpt = str(tmp_path / "ck.npz")
    cfg = _cfg(num_bursts=4, checkpoint=ckpt)

    # simulate preemption: die right after the burst-2 checkpoint lands
    real_save = ckpt_mod.save
    calls = {"n": 0}

    def dying_save(*a, **k):
        real_save(*a, **k)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption")

    ckpt_mod.save = dying_save
    try:
        with pytest.raises(KeyboardInterrupt):
            mcmc(path, out, cfg)
    finally:
        ckpt_mod.save = real_save

    # resume: warmup skipped, bursts 2-3 appended into the same file
    mcmc(path, out, cfg)
    total = 6 + 4 + 4 + 20
    with h5py.File(out, "r") as f:
        psi = f["samples/psi"][:]
        assert psi.shape[0] == total
        assert np.isfinite(psi).all()
        # burst rows written both before and after the resume point
        assert np.abs(psi[total - 1]) > 0
        assert np.abs(psi[6 + 4 + 4]) > 0


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


@pytest.mark.slow
def test_convergence_gate_stops_early_and_truncates(tmp_path, rng):
    """With a generous gate the run stops before num_bursts and the
    posterior datasets are truncated to the written draws; with an
    unreachable gate it runs every burst (VERDICT round 1 #6)."""
    import h5py
    import json

    from covid19uk_tpu.inference.driver import mcmc

    path = str(tmp_path / "data.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    warm = 6 + 4 + 4

    out_easy = str(tmp_path / "post_easy.h5")
    log_easy = str(tmp_path / "log_easy.jsonl")
    mcmc(path, out_easy, _cfg(num_bursts=6, num_chains=2, rhat_stop=50.0,
                              log_file=log_easy))
    with h5py.File(out_easy, "r") as f:
        n = f["samples/psi"].shape[0]
        assert n == warm + 5  # stopped after the first burst
        assert f["results/hmc/is_accepted"].shape[0] == n
    events = [json.loads(l) for l in open(log_easy)]
    gates = [e for e in events if e["event"] == "gate"]
    assert gates and gates[-1]["converged"] is True

    out_hard = str(tmp_path / "post_hard.h5")
    log_hard = str(tmp_path / "log_hard.jsonl")
    mcmc(path, out_hard, _cfg(num_bursts=3, num_chains=2,
                              rhat_stop=1.0000001, ess_stop=10**9,
                              log_file=log_hard))
    with h5py.File(out_hard, "r") as f:
        assert f["samples/psi"].shape[0] == warm + 15  # all bursts ran
    events = [json.loads(l) for l in open(log_hard)]
    gates = [e for e in events if e["event"] == "gate"]
    assert len(gates) == 3 and all(not g["converged"] for g in gates)


def test_pair_kernel_phase_split(tmp_path, rng):
    """Warmup windows run the pair kernel; sampling bursts do not (the
    default num_pair_updates_sampling=0) — visible in the results trace:
    pair proposals have x_star == 0 for every burst draw, and the warmup
    phase actually proposed (nonzero x_star somewhere)."""
    import h5py

    from covid19uk_tpu.inference.driver import mcmc

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    mcmc(path, out, _cfg())

    warm_total = 6 + 4 + 4
    with h5py.File(out, "r") as f:
        pd = f["results/move/S->E+E->I_pair/proposed_delta"][:]
        # layout [draw, 4 fields, pair_mmax]; field 3 is x_star
        x_star = pd[:, 3, :]
        assert (x_star[warm_total:] == 0).all()
        assert (x_star[:warm_total] != 0).any()


def test_pair_kernel_sampling_opt_in(tmp_path, rng):
    """num_pair_updates_sampling=1 keeps pair moves on during bursts."""
    import h5py

    from covid19uk_tpu.inference.driver import mcmc

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    mcmc(path, out, _cfg(num_pair_updates_sampling=1))

    warm_total = 6 + 4 + 4
    with h5py.File(out, "r") as f:
        x_star = f["results/move/S->E+E->I_pair/proposed_delta"][:, 3, :]
        assert (x_star[warm_total:] != 0).any()


def test_store_warmup_false_stores_sampling_only(tmp_path, rng):
    """store_warmup=False: the posterior holds exactly the sampling rows
    (the MSOA store-size knob), and a kill+resume keeps the accounting."""
    import h5py

    from covid19uk_tpu.inference.driver import mcmc
    from covid19uk_tpu.utils import checkpoint as ckpt_mod

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    ckpt = str(tmp_path / "ck.npz")
    cfg = _cfg(num_bursts=4, store_warmup=False, checkpoint=ckpt)

    real_save = ckpt_mod.save
    calls = {"n": 0}

    def dying_save(*a, **k):
        real_save(*a, **k)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption")

    ckpt_mod.save = dying_save
    try:
        with pytest.raises(KeyboardInterrupt):
            mcmc(path, out, cfg)
    finally:
        ckpt_mod.save = real_save
    mcmc(path, out, cfg)  # resume

    total = 4 * 5  # sampling rows only — no warmup rows
    with h5py.File(out, "r") as f:
        psi = f["samples/psi"][:]
        assert psi.shape[0] == total
        assert np.isfinite(psi).all()
        assert np.abs(psi).min() > 0  # every row written (incl. resumed)
