"""Simulation-based calibration: simulate -> infer -> recover parameters.

Two layers of evidence:

1. **Fixed-events HMC recovery** — with the latent event tensor fixed at the
   simulated truth, the continuous-parameter posterior must cover the true
   (gamma0, alpha_0) tightly.  This validates the model density + HMC +
   adaptation end to end, with no identifiability caveats.

2. **Full-pipeline run** — the driver path (imputation, event kernels,
   occults).  Event totals outside the final-21-day occult window are pinned
   by the imputation (moves conserve totals; occults are restricted to
   t_range — the same structural property as the reference,
   inference.py:334-341), so early-window latent stocks cannot be corrected
   by the sampler and absolute parameter recovery is only loose.  We assert
   sampler health and loose coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.models.spec import (
    CovidUK,
    ModelData,
    Parameters,
    pack_parameters,
    unconstrain_parameters,
)
from covid19uk_tpu.utils import ncio


TRUE = dict(psi=0.4, gamma0=np.log(0.45), alpha_0=-0.75)


def _make_model(rng, M=6, T0=30, init_stock=(250.0, 350.0)):
    C = rng.uniform(0, 200, size=(M, M))
    np.fill_diagonal(C, 0)
    adjacency = np.zeros((M, M))
    for i in range(M - 1):
        adjacency[i, i + 1] = adjacency[i + 1, i] = 1.0
    covariates = dict(
        C=C,
        W=np.ones(T0),
        N=rng.uniform(8e4, 1.5e5, size=M),
        adjacency=adjacency,
        weekday=(np.arange(T0) % 7 < 5).astype(float),
        area=rng.uniform(1e8, 5e9, size=M),
    )
    data = ModelData.create(covariates, jnp.float64)
    N = np.asarray(data.N)
    e0, i0 = init_stock
    init = np.stack(
        [N - e0 - i0, np.full(M, e0), np.full(M, i0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T0)
    return model, covariates


def _true_params(M, T0):
    return Parameters(
        psi=jnp.float64(TRUE["psi"]),
        sigma_space=jnp.float64(0.05),
        beta_area=jnp.float64(0.0),
        gamma0=jnp.float64(TRUE["gamma0"]),
        gamma1=jnp.float64(0.0),
        alpha_0=jnp.float64(TRUE["alpha_0"]),
        alpha_t=jnp.zeros(T0 - 1, jnp.float64),
        spatial_effect=jnp.zeros(M, jnp.float64),
    )


@pytest.mark.slow
def test_fixed_events_hmc_recovery(rng):
    """HMC over the continuous parameters, events fixed at simulated truth."""
    from covid19uk_tpu.inference import dual_averaging, welford
    from covid19uk_tpu.inference.hmc import hmc_step
    from covid19uk_tpu.inference.warmup import regularized_variance

    M, T0 = 6, 30
    model, _ = _make_model(rng, M, T0)
    params = _true_params(M, T0)
    events = model.sample_seir(jax.random.PRNGKey(42), params)

    logp = lambda u: model.joint_log_prob_unconstrained(u, events)
    u = jnp.zeros_like(unconstrain_parameters(pack_parameters(params)))

    # dual-averaging warmup, then Welford mass, then fixed sampling
    da = dual_averaging.init(0.1, jnp.float64)
    inv_mass = jnp.ones_like(u)

    def warm(carry, key):
        u, da, wf, inv_mass = carry
        u, info = hmc_step(
            key, u, logp, dual_averaging.step_size(da), 16, inv_mass
        )
        acc = jnp.exp(jnp.minimum(info.log_accept_ratio, 0.0))
        da = dual_averaging.update(da, jnp.where(jnp.isfinite(acc), acc, 0.0))
        wf = welford.update(wf, u)
        inv_mass_new = regularized_variance(wf)
        use = wf.count > 50.0
        inv_mass = jnp.where(use, inv_mass_new, inv_mass)
        return (u, da, wf, inv_mass), None

    wf = welford.init(u.shape, jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(0), 600)
    (u, da, wf, inv_mass), _ = jax.lax.scan(warm, (u, da, wf, inv_mass), keys)

    step_size = dual_averaging.step_size(da)

    def sample(carry, key):
        u = carry
        u, info = hmc_step(key, u, logp, step_size, 16, inv_mass)
        return u, (u, info.is_accepted)

    keys = jax.random.split(jax.random.PRNGKey(1), 800)
    _, (draws_u, accepted) = jax.lax.scan(sample, u, keys)

    from covid19uk_tpu.models.spec import constrain_parameters

    acc_rate = float(np.asarray(accepted).mean())
    assert acc_rate > 0.4, acc_rate
    con = np.asarray(constrain_parameters(draws_u))[200:]
    gamma0 = con[:, 3]
    alpha_0 = con[:, 5]
    psi = con[:, 0]
    for name, draws, truth in [
        ("gamma0", gamma0, TRUE["gamma0"]),
        ("alpha_0", alpha_0, TRUE["alpha_0"]),
    ]:
        mean, sd = draws.mean(), draws.std()
        err = abs(mean - truth)
        tol = max(5 * sd, 0.08)
        assert err < tol, f"{name}: {mean:.3f}+-{sd:.3f} vs {truth:.3f}"
    assert 0.0 < psi.mean() < 1.5


def _simulate_dataset(path, rng, M=6, T0=30):
    model, covariates = _make_model(rng, M, T0, init_stock=(30.0, 40.0))
    params = _true_params(M, T0)
    events = np.asarray(model.sample_seir(jax.random.PRNGKey(42), params))
    cases = events[..., 2]
    dates = np.arange(
        np.datetime64("2021-01-01"), np.datetime64("2021-01-01") + T0
    )
    constant = ncio.Group(variables=covariates, coords=dict(time=dates))
    obs = ncio.Group(variables=dict(cases=cases), coords=dict(time=dates))
    ncio.save_group(path, "constant_data", constant, mode="w")
    ncio.save_group(path, "observations", obs)
    return cases


@pytest.mark.slow
def test_full_pipeline_health_and_loose_recovery(tmp_path, rng):
    import h5py

    from covid19uk_tpu.inference.driver import mcmc

    data_path = str(tmp_path / "sim.h5")
    out = str(tmp_path / "post.h5")
    cases = _simulate_dataset(data_path, rng)
    assert cases.sum() > 200  # epidemic didn't die out

    config = dict(
        dmax=10, nmax=20, m=2, occult_nmax=10, num_event_time_updates=3,
        num_bursts=6, num_burst_samples=50, thin=1, dtype="float64", seed=3,
        warmup=dict(
            first_window=100, slow_window=20, num_slow_windows=3,
            last_window=40,
        ),
    )
    mcmc(data_path, out, config)

    with h5py.File(out, "r") as f:
        n_keep = 250
        gamma0 = f["samples/gamma0"][-n_keep:]
        psi = f["samples/psi"][-n_keep:]
        hmc_acc = f["results/hmc/is_accepted"][-n_keep:].mean()
        move_acc = f["results/move/S->E/is_accepted"][:].mean()

    assert 0.3 < hmc_acc <= 1.0
    assert move_acc > 0.0
    # latent event totals are imputation-pinned outside the occult window
    # (see module docstring): only loose coverage is achievable here.
    assert abs(gamma0.mean() - TRUE["gamma0"]) < 0.8, gamma0.mean()
    assert 0.0 < psi.mean() < 1.5
