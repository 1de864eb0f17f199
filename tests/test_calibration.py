"""CI-reduced calibration study (tools/calibration_study.py).

The production study runs K=50+ NI-scale datasets on the TPU
(docs/calibration.md); this reduced version checks the machinery
end-to-end on the forced-CPU test backend: batched-model fitting of many
datasets in one vmapped program, both initialization arms, and the
coverage/z summaries.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_calibration_study_reduced(rng):
    import jax.numpy as jnp

    from covid19uk_tpu.utils.synthetic import build_synthetic_model
    from tools.calibration_study import SCALARS, run_study

    M, T, K = 5, 25, 4
    model = build_synthetic_model(M, T, jnp.float64, rng_seed=3,
                                  sparse=False)
    truth = dict(
        psi=0.4, sigma_space=0.1, beta_area=0.0,
        gamma0=float(np.log(0.45)), gamma1=0.0, alpha_0=-1.0,
    )
    results, fit = run_study(
        model, truth, K=K, warm=150, draws=300, seed=5,
        dtype_str="float64", arms=("imputed", "truth"),
        progress=lambda *_: None,
    )

    # machinery checks: both arms summarized for every scalar, all finite
    for arm in ("imputed", "truth"):
        for name in SCALARS:
            s = results[arm][name]
            assert np.isfinite(s["z_mean"]), (arm, name, s)
            assert 0.0 <= s["coverage"]["0.8"] <= 1.0
            assert s["ess_min"] > 0
    assert np.isfinite(fit["scalars"]).all()
    # constrained scalars: psi / sigma_space must be positive (softplus)
    assert (fit["scalars"][..., :2] > 0).all()
    # chains moved
    assert fit["scalars"][:, 0, 3].std() >= 0  # smoke
    assert fit["hmc_accept"] > 0.1
    # the two arms start from different latents (imputed vs truth) and
    # must actually reach the fit as distinct chains.  person_time here
    # is a DEVIATION from the initial infectious count (sum_t I_t - I_0),
    # so its sign is trajectory-dependent at this tiny scale — assert
    # finiteness and arm separation, not sign.
    for arm in ("imputed", "truth"):
        assert np.isfinite(results[arm]["person_time_mean"])
    assert (
        results["truth"]["person_time_mean"]
        != results["imputed"]["person_time_mean"]
    )
