"""Subtle prediction/logging behaviors ported from the reference."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.models.spec import CovidUK
from covid19uk_tpu.posterior.predict import predicted_incidence
from tests.test_spec import make_test_data, make_test_params


def _samples_from(params, model, S, seed=0):
    events = jnp.stack(
        [model.sample_seir(jax.random.PRNGKey(seed + i), params)
         for i in range(S)]
    )
    tile = lambda x: np.tile(np.asarray(x), (S,) + (1,) * np.asarray(x).ndim)
    return {
        "psi": tile(params.psi),
        "sigma_space": tile(params.sigma_space),
        "beta_area": tile(params.beta_area),
        "gamma0": tile(params.gamma0),
        "gamma1": tile(params.gamma1),
        "alpha_0": tile(params.alpha_0),
        "alpha_t": tile(params.alpha_t),
        "spatial_effect": tile(params.spatial_effect),
        "seir": np.asarray(events),
    }


def test_oos_prediction_rebases_alpha0(rng):
    """Out-of-sample prediction from init_step>0 must re-base alpha_0 to the
    random-walk value at init_step-1 (reference predict.py:40-48) — with a
    strongly trending alpha_t, ignoring the re-base would use a rate off by
    exp(sum alpha_t), visible in total incidence."""
    M, T = 4, 20
    data = make_test_data(rng, M, T, jnp.float32)
    params = make_test_params(rng, M, T, jnp.float32)
    # strong upward trend: alpha at day 10 is ~1.0 above alpha_0
    params = params._replace(
        alpha_t=jnp.full((T - 1,), 0.1, jnp.float32),
        alpha_0=jnp.float32(-2.5),
    )
    N = np.asarray(data.N)
    init = np.stack(
        [N - 600, np.full(M, 250.0), np.full(M, 350.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float32), 0, T)
    samples = _samples_from(params, model, S=30)

    init_step, horizon = 10, 8
    # A: trending alpha_t -> rebased alpha_0 = -2.5 + 10*0.1 = -1.5
    _, ev_trend = predicted_incidence(
        dict(samples), init, data, init_step, horizon, out_of_sample=True,
        seed=5,
    )
    # B: identical events (=> identical start state) but flat alpha_t:
    # the re-base is a no-op and the effective rate stays at exp(-2.5).
    flat = dict(samples)
    flat["alpha_t"] = np.zeros_like(samples["alpha_t"])
    _, ev_flat = predicted_incidence(
        flat, init, data, init_step, horizon, out_of_sample=True, seed=5
    )
    se_trend = float(np.asarray(ev_trend)[..., 0].sum())
    se_flat = float(np.asarray(ev_flat)[..., 0].sum())
    # exp(1) ~ 2.7x more infections when the re-base is applied
    assert se_trend > 1.8 * se_flat, (se_trend, se_flat)


def test_run_log_jsonl_events(tmp_path, rng):
    """The driver emits machine-readable window/burst/diagnostics events."""
    from covid19uk_tpu.inference.driver import mcmc
    from tests.test_driver import make_synthetic_datafile

    path = str(tmp_path / "d.h5")
    out = str(tmp_path / "p.h5")
    logf = str(tmp_path / "run.jsonl")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    mcmc(
        path,
        out,
        dict(
            dmax=4, nmax=8, m=2, occult_nmax=4, num_event_time_updates=1,
            num_bursts=2, num_burst_samples=4, thin=1, dtype="float64",
            seed=1, log_file=logf,
            warmup=dict(first_window=4, slow_window=4, num_slow_windows=1,
                        last_window=4),
        ),
    )
    events = [json.loads(line) for line in open(logf)]
    kinds = [e["event"] for e in events]
    assert kinds.count("window") == 3
    assert kinds.count("burst") == 2
    assert kinds[-1] == "diagnostics"
    w = next(e for e in events if e["event"] == "window")
    assert {"hmc_accept", "draws_per_sec", "step_size"} <= set(w)
    d = events[-1]
    assert "psi" in d and "ess" in d["psi"]


def test_oos_alpha_resim_formula_at_positive_init_step(rng):
    """At init_step > 0 the re-simulated OOS log-rate series must equal the
    reference's formula: a fresh prediction-window random walk
    b' = alpha_0' + cumsum(alpha_t'), gathered at clipped ABSOLUTE time
    (model_spec.py:242-256) — so for init_step >= horizon-1 every
    prediction step reads the walk endpoint (VERDICT round 1 #10)."""
    from covid19uk_tpu.models.spec import _alpha_timeseries

    M, T = 3, 30
    data = make_test_data(rng, M, T, jnp.float64)
    init = np.stack(
        [np.asarray(data.N) - 30, np.full(M, 10.0), np.full(M, 20.0),
         np.zeros(M)], -1
    )

    for init_step, horizon in [(3, 8), (10, 8), (25, 5)]:
        model = CovidUK(data, jnp.asarray(init), init_step, horizon)
        fresh = model.sample_prior_alpha_t(jax.random.PRNGKey(7), jnp.float64)
        assert fresh.shape == (horizon - 1,)  # prediction-window prior
        alpha_0 = jnp.float64(-1.3)
        t_abs = init_step + jnp.arange(horizon)
        got = np.asarray(_alpha_timeseries(alpha_0, fresh, t_abs))
        b = -1.3 + np.cumsum(np.asarray(fresh))
        want = np.where(
            np.asarray(t_abs) == 0,
            -1.3,
            b[np.clip(np.asarray(t_abs) - 1, 0, horizon - 2)],
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)
        if init_step >= horizon - 1:
            # endpoint clamp: the whole window reads b'[-1]
            np.testing.assert_allclose(got, b[-1])


def test_oos_prediction_varies_across_seeds_at_positive_init_step(rng):
    """OOS at init_step>0 must actually re-draw alpha_t (different seeds =>
    different trajectories), while in-sample prediction reuses the
    posterior alpha_t (same events => same rates, only binomial noise)."""
    M, T = 4, 20
    data = make_test_data(rng, M, T, jnp.float32)
    params = make_test_params(rng, M, T, jnp.float32)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 600, np.full(M, 250.0), np.full(M, 350.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float32), 0, T)
    samples = _samples_from(params, model, S=6)

    _, ev_a = predicted_incidence(
        dict(samples), init, data, 10, 6, out_of_sample=True, seed=1
    )
    _, ev_b = predicted_incidence(
        dict(samples), init, data, 10, 6, out_of_sample=True, seed=2
    )
    assert not np.array_equal(np.asarray(ev_a), np.asarray(ev_b))
    assert np.isfinite(np.asarray(ev_a)).all()
