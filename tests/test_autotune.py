"""Acceptance autotuning: traced decays + Robbins–Monro driver loop.

VERDICT r03 item 4: the reference manually tunes its event-move kernels
toward ~23% acceptance (doc/lancs_space_model_concept.tex:325-326); the
framework's `autotune_acceptance` knob does this automatically during the
warmup windows, passing the retuned decays through the jit boundary as
traced scalars (no recompiles), then freezing them for sampling.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_driver import make_synthetic_datafile


def _truncgeom_pmf(cap, decay):
    x = np.arange(1, cap + 1)
    p = decay ** (x - 1)
    return p / p.sum()


@pytest.mark.parametrize("decay", [0.7, 0.3])
def test_traced_truncated_geometric_matches_distribution(decay):
    """The traced-decay branch of _sample_truncated_geometric draws the
    same truncated-geometric distribution as the static branch, and both
    report the same Hastings normalizer."""
    from covid19uk_tpu.inference.event_kernels import (
        _log_mass_geometric,
        _sample_truncated_geometric,
    )

    cap = jnp.full((20000,), 8.0, jnp.float64)
    key = jax.random.PRNGKey(0)
    xs_static, lm_static = _sample_truncated_geometric(key, cap, decay)
    xs_traced, lm_traced = _sample_truncated_geometric(
        key, cap, jnp.asarray(decay, jnp.float64)
    )
    np.testing.assert_allclose(
        np.asarray(lm_static), np.asarray(lm_traced), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(_log_mass_geometric(cap[0], decay)),
        float(_log_mass_geometric(cap[0], jnp.asarray(decay, jnp.float64))),
        rtol=1e-6,
    )
    want = _truncgeom_pmf(8, decay)
    for xs in (xs_static, xs_traced):
        got = np.bincount(np.asarray(xs).astype(int), minlength=9)[1:] / len(
            np.asarray(xs)
        )
        tv = 0.5 * np.abs(got - want).sum()
        assert tv < 0.02, (tv, got, want)


def test_traced_two_sided_geometric_matches_distribution():
    """Ditto for the two-sided displacement proposal."""
    from covid19uk_tpu.inference.event_kernels import (
        _sample_two_sided_geometric,
    )

    decay = 0.6
    n = 20000
    left = jnp.full((n,), 3, jnp.int64)
    right = jnp.full((n,), 5, jnp.int64)
    key = jax.random.PRNGKey(1)
    d_static, lm_static = _sample_two_sided_geometric(key, left, right, decay)
    d_traced, lm_traced = _sample_two_sided_geometric(
        key, left, right, jnp.asarray(decay, jnp.float64)
    )
    np.testing.assert_allclose(
        np.asarray(lm_static), np.asarray(lm_traced), rtol=1e-5
    )
    support = np.array([-3, -2, -1, 1, 2, 3, 4, 5])
    p = decay ** (np.abs(support) - 1.0)
    want = p / p.sum()
    for d in (d_static, d_traced):
        d = np.asarray(d).astype(int)
        got = np.array([(d == s).mean() for s in support])
        tv = 0.5 * np.abs(got - want).sum()
        assert tv < 0.02, (tv, got, want)


@pytest.mark.slow
def test_driver_autotune_moves_decays_toward_target(tmp_path, rng):
    """A short run with autotune_acceptance=True must (a) complete, (b) log
    per-window move acceptances and decays, and (c) keep decays inside the
    clamp range while moving them off the initial value (unless the window
    acceptance already equals the target exactly, which has probability 0
    on a finite window)."""
    from covid19uk_tpu.inference.driver import mcmc

    path = str(tmp_path / "data.h5")
    out = str(tmp_path / "post.h5")
    logf = str(tmp_path / "run.jsonl")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    cfg = dict(
        dmax=4, nmax=8, m=2, occult_nmax=4, num_event_time_updates=2,
        num_bursts=2, num_burst_samples=5, thin=1, dtype="float64", seed=1,
        autotune_acceptance=True, move_accept_target=0.23, log_file=logf,
        warmup=dict(first_window=8, slow_window=4, num_slow_windows=2,
                    last_window=4),
    )
    mcmc(path, out, cfg)

    windows = []
    with open(logf) as f:
        for line in f:
            ev = json.loads(line)
            if ev.get("event") == "window":
                windows.append(ev)
    assert len(windows) == 4  # fast + 2 slow + fast
    for w in windows:
        assert "move_se_accept" in w and "move_decay_se" in w
        assert 0.05 <= w["move_decay_se"] <= 1.0
        assert 0.05 <= w["move_decay_ei"] <= 1.0
    # the decays must have moved off the initial config value by the end
    assert (
        windows[-1]["move_decay_se"] != pytest.approx(0.9, abs=1e-9)
        or windows[-1]["move_decay_ei"] != pytest.approx(0.9, abs=1e-9)
    )


def test_posterior_open_rejects_mismatched_template(tmp_path):
    """Posterior.open must fail fast when the resumed run's templates do
    not match the stored datasets (VERDICT r03 'resume trusts the store
    blindly')."""
    from covid19uk_tpu.utils.store import Posterior

    path = str(tmp_path / "p.h5")
    samples = {"psi": np.zeros((1, 2), np.float64)}  # 2 chains
    results = {"hmc": {"is_accepted": np.zeros((1, 2), bool)}}
    st = Posterior(path, samples, results, num_samples=10)
    st.close()

    # same templates reopen fine
    Posterior.open(path, samples, results).close()

    # changed chain count -> fail fast
    bad = {"psi": np.zeros((1, 4), np.float64)}
    with pytest.raises(ValueError, match="trailing shape"):
        Posterior.open(path, bad, None)

    # changed dtype -> fail fast
    bad = {"psi": np.zeros((1, 2), np.float32)}
    with pytest.raises(ValueError, match="dtype"):
        Posterior.open(path, bad, None)

    # missing dataset -> fail fast
    bad = {"nonexistent": np.zeros((1, 2), np.float64)}
    with pytest.raises(ValueError, match="missing"):
        Posterior.open(path, bad, None)
