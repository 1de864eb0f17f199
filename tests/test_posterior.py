"""Tests for the posterior post-processing layer."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.ngm import next_generation_matrix_fn
from covid19uk_tpu.models.spec import CovidUK
from tests.test_spec import make_test_data, make_test_params


def test_ngm_matches_hand_computation(rng):
    M, T = 4, 8
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    state = np.stack(
        [N - 100, np.full(M, 40.0), np.full(M, 60.0), np.zeros(M)], -1
    )
    t = 3
    got = np.asarray(
        next_generation_matrix_fn(data, params)(t, jnp.asarray(state))
    )

    # hand-compute (model_spec.py:316-366).  NOTE the reference's NGM
    # gathers b[clip(t, 0, T-2)] at t>0 (model_spec.py:331-343) — one day
    # AHEAD of the seir rate fn's b[clip(t-1, ...)] convention.
    Cstar = np.asarray(data.Cstar)
    w_t = float(np.asarray(data.W)[t])
    b = float(params.alpha_0) + np.cumsum(np.asarray(params.alpha_t))
    alpha_t_ = b[min(t, len(b) - 1)] if t > 0 else float(params.alpha_0)
    eta = (
        alpha_t_
        + float(params.beta_area) * np.asarray(data.log_area)[:, None]
        + float(params.sigma_space) * np.asarray(params.spatial_effect)[None, :]
    )
    rate = (
        np.exp(eta)
        * (np.eye(M) + float(params.psi) * w_t * Cstar / N[None, :])
        / N[:, None]
    )
    prob = -np.expm1(-rate)
    period = 1.0 / -np.expm1(-np.exp(float(params.gamma0)))
    want = prob * state[:, 0][:, None] * period
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rit_row_reduction_consistency(rng):
    """R_it from calc_posterior_rit == manual NGM row sums per sample/time."""
    from covid19uk_tpu.posterior.reproduction_number import calc_posterior_rit

    M, T, S = 4, 8, 3
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 50, np.full(M, 20.0), np.full(M, 30.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = jnp.stack(
        [
            model.sample_seir(jax.random.PRNGKey(i), params)
            for i in range(S)
        ]
    )
    samples = {
        "psi": np.full(S, float(params.psi)),
        "sigma_space": np.full(S, float(params.sigma_space)),
        "beta_area": np.full(S, float(params.beta_area)),
        "gamma0": np.full(S, float(params.gamma0)),
        "gamma1": np.full(S, float(params.gamma1)),
        "alpha_0": np.full(S, float(params.alpha_0)),
        "alpha_t": np.tile(np.asarray(params.alpha_t), (S, 1)),
        "spatial_effect": np.tile(np.asarray(params.spatial_effect), (S, 1)),
        "seir": np.asarray(events),
    }
    times = np.arange(T)
    r_it = np.asarray(
        calc_posterior_rit(samples, init, times, data, jnp.float64)
    )
    assert r_it.shape == (S, T, M)

    s, t = 1, 4
    state = np.asarray(seir.compute_state(jnp.asarray(init, jnp.float64),
                                          events[s]))
    ngm = np.asarray(
        next_generation_matrix_fn(data, params)(t, jnp.asarray(state[:, t]))
    )
    np.testing.assert_allclose(r_it[s, t], ngm.sum(axis=-2), rtol=1e-8)


@pytest.mark.slow
def test_full_pipeline(tmp_path, rng):
    """mcmc -> thin -> predict (in+out of sample) -> Rt -> within/between."""
    from covid19uk_tpu.inference.driver import mcmc
    from covid19uk_tpu.posterior.thin import thin_posterior
    from covid19uk_tpu.posterior.predict import predict
    from covid19uk_tpu.posterior.reproduction_number import reproduction_number
    from covid19uk_tpu.posterior.within_between import within_between
    from covid19uk_tpu.utils import ncio
    from tests.test_driver import make_synthetic_datafile

    data_path = str(tmp_path / "data.h5")
    post_path = str(tmp_path / "posterior.h5")
    pkl_path = str(tmp_path / "samples.pkl")
    make_synthetic_datafile(data_path, rng, M=4, T0=25)

    config = dict(
        dmax=4, nmax=8, m=2, occult_nmax=4, num_event_time_updates=2,
        num_bursts=2, num_burst_samples=10, thin=1, dtype="float64", seed=1,
        warmup=dict(first_window=8, slow_window=4, num_slow_windows=1,
                    last_window=6),
    )
    mcmc(data_path, post_path, config)

    thin_posterior(post_path, pkl_path, dict(start=10, end=38, by=2))
    with open(pkl_path, "rb") as f:
        samples = pickle.load(f)
    assert samples["seir"].shape[0] == 14
    assert "initial_state" in samples

    # in-sample prediction
    pred_path = str(tmp_path / "pred.h5")
    init_state, events = predict(data_path, pkl_path, pred_path, 0, 25)
    assert events.shape == (14, 4, 25, 3)
    g = ncio.load_group(pred_path, "predictions")
    assert g["events"].shape == (14, 4, 25, 3)
    assert np.isfinite(g["events"]).all()

    # out-of-sample prediction from the final state
    pred2 = str(tmp_path / "pred_oos.h5")
    _, ev2 = predict(data_path, pkl_path, pred2, -1, 7, out_of_sample=True)
    assert ev2.shape == (14, 4, 7, 3)

    # reproduction number
    rt_path = str(tmp_path / "rt.h5")
    r_it, r_t = reproduction_number([data_path, pkl_path], rt_path)
    assert r_it.shape == (14, 25, 4)
    assert r_t.shape == (14, 25)
    assert np.isfinite(r_it).all() and (r_it >= 0).all()
    g = ncio.load_group(rt_path, "posterior_predictive")
    assert g["R_t"].shape == (14, 25)

    # within/between CSV
    csv_path = str(tmp_path / "wb.csv")
    df = within_between([data_path, pkl_path], csv_path)
    assert len(df) == 4
    assert np.isfinite(df["within_mean"]).all()


def test_within_between_p_is_per_location(rng):
    """p_within_gt_between must be a per-location posterior probability
    (the reference broadcasts one axis-less scalar — documented divergence)."""
    from covid19uk_tpu.posterior.within_between import calc_pressure_components
    from tests.test_spec import make_test_data

    M, T = 6, 10
    data = make_test_data(rng, M, T)
    S = 40
    psi = jnp.asarray(rng.uniform(0.1, 1.0, S))
    state = jnp.asarray(
        np.stack(
            [
                rng.uniform(100, 200, (S, M)),
                rng.uniform(5, 20, (S, M)),
                rng.uniform(5, 50, (S, M)),
                rng.uniform(0, 10, (S, M)),
            ],
            axis=-1,
        )
    )
    within, between = calc_pressure_components(data, psi, state)
    p = np.mean(np.asarray(within) > np.asarray(between), axis=0)
    assert p.shape == (M,)
    # fractions sum to one per (sample, location)
    np.testing.assert_allclose(
        np.asarray(within) + np.asarray(between), 1.0, rtol=1e-6
    )
