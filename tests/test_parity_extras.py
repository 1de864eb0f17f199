"""Tests for the long-tail parity components: the GP regression
conditional (reference model_spec.py:129-136), TierData (reference
data/tiers.py), and the legacy util helpers (reference util.py:25-74)."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from covid19uk_tpu.models.gp import (
    GaussianProcess,
    conditional_gp,
    rbf_kernel,
)


class TestConditionalGP:
    def _prior(self, noise=0.0):
        x = jnp.linspace(0.0, 4.0, 5)[:, None]
        return GaussianProcess(
            kernel=rbf_kernel(amplitude=1.3, length_scale=0.8),
            index_points=x,
            observation_noise_variance=noise,
        )

    def test_noiseless_interpolation(self):
        """With zero noise the posterior passes through the observations."""
        gp = self._prior(noise=0.0)
        y = jnp.sin(gp.index_points[:, 0])
        post = conditional_gp(
            gp, y, gp.index_points, predictive_noise_variance=0.0
        )
        np.testing.assert_allclose(post.mean, y, atol=1e-6)
        np.testing.assert_allclose(post.stddev(), 0.0, atol=1e-4)

    def test_matches_direct_formula(self):
        """Cholesky-solve conditional == explicit-inverse textbook formula."""
        rng = np.random.default_rng(1)
        noise = 0.1
        gp = self._prior(noise=noise)
        y = rng.normal(size=5)
        xs = np.linspace(-0.7, 4.9, 7)[:, None]
        post = conditional_gp(gp, jnp.asarray(y), jnp.asarray(xs))

        k = rbf_kernel(amplitude=1.3, length_scale=0.8)
        x = np.asarray(gp.index_points)
        kxx = np.asarray(k(x, x)) + noise * np.eye(5)
        ksx = np.asarray(k(jnp.asarray(xs), jnp.asarray(x)))
        kss = np.asarray(k(jnp.asarray(xs), jnp.asarray(xs)))
        kinv = np.linalg.inv(kxx)
        mean = ksx @ kinv @ y
        # predictive_noise_variance defaults to observation noise (TFP
        # GaussianProcessRegressionModel semantics the reference relies on)
        cov = kss - ksx @ kinv @ ksx.T + noise * np.eye(7)
        np.testing.assert_allclose(post.mean, mean, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(post.covariance, cov, rtol=1e-4, atol=1e-6)

    def test_log_prob_matches_scipy(self):
        from scipy import stats

        gp = self._prior(noise=0.05)
        rng = np.random.default_rng(2)
        y = rng.normal(size=5)
        xs = np.array([[0.5], [2.5]])
        post = conditional_gp(gp, jnp.asarray(y), jnp.asarray(xs))
        probe = np.array([0.3, -0.2])
        expected = stats.multivariate_normal(
            np.asarray(post.mean), np.asarray(post.covariance)
        ).logpdf(probe)
        np.testing.assert_allclose(
            post.log_prob(jnp.asarray(probe)), expected, rtol=1e-5
        )

    def test_sample_moments(self):
        gp = self._prior(noise=0.05)
        y = jnp.zeros(5)
        xs = jnp.array([[1.7]])
        post = conditional_gp(gp, y, xs)
        draws = post.sample(jax.random.PRNGKey(0), sample_shape=(4000,))
        assert draws.shape == (4000, 1)
        np.testing.assert_allclose(
            draws.mean(), post.mean[0], atol=4 * post.stddev()[0] / 60
        )
        np.testing.assert_allclose(
            draws.std(), post.stddev()[0], rtol=0.1
        )

    def test_jittable(self):
        gp = self._prior(noise=0.01)
        y = jnp.ones(5)
        xs = jnp.array([[0.25], [3.75]])
        f = jax.jit(lambda yy: conditional_gp(gp, yy, xs).mean)
        np.testing.assert_allclose(f(y), conditional_gp(gp, y, xs).mean)


class TestTierData:
    def _config(self, tmp_path, df, fmt, lockdown_states=None):
        path = tmp_path / "tiers.csv"
        df.to_csv(path, index=False)
        cfg = {
            "TierData": {
                "input": "csv",
                "address": str(path),
                "format": fmt,
            },
            "lad19cds": ["E06000001", "E06000002"],
            "date_range": ["2020-11-30", "2020-12-04"],
        }
        if lockdown_states is not None:
            cfg["TierData"]["lockdown_states"] = lockdown_states
        return cfg

    def test_api_format_ffill_and_onehot(self, tmp_path):
        from covid19uk_tpu.data.tiers import TierData

        # Sparse feed: levels only on change days; E06000002 changes on
        # 12-02; a non-requested LAD must be filtered out.
        df = pd.DataFrame(
            {
                "date": ["2020-11-28", "2020-11-28", "2020-12-02", "2020-12-03"],
                "areaCode": ["E06000001", "E06000002", "E06000002", "E09000999"],
                "alertLevel": [3, 2, 4, 5],
            }
        )
        xarr = TierData.process(self._config(tmp_path, df, "api"))
        assert xarr.dims == ("date", "lad19cd", "alert_level")
        assert list(xarr.coords["lad19cd"]) == [
            "E06000001",
            "E06000002",
        ]
        # Daily grid [2020-11-30, 2020-12-04)
        assert xarr.shape == (4, 2, 3)  # levels {2, 3, 4}
        sel = xarr.sel(lad19cd="E06000001", alert_level=3)
        np.testing.assert_array_equal(sel.values, np.ones(4))  # ffilled
        sel2 = xarr.sel(lad19cd="E06000002")
        # level 2 until 12-01, level 4 from 12-02
        np.testing.assert_array_equal(
            sel2.sel(alert_level=2).values, [1, 1, 0, 0]
        )
        np.testing.assert_array_equal(
            sel2.sel(alert_level=4).values, [0, 0, 1, 1]
        )
        # exactly one active level per (date, lad)
        np.testing.assert_array_equal(xarr.sum("alert_level").values, 1.0)

    def test_tidy_format_december_renaming(self, tmp_path):
        from covid19uk_tpu.data.tiers import TierData

        df = pd.DataFrame(
            {
                "code": ["E06000001", "E06000001", "E06000002", "E06000002"],
                "name": ["a", "a", "b", "b"],
                "kind": ["LAD"] * 4,
                "date": ["2020-12-01", "2020-12-03", "2020-12-01", "2020-12-03"],
                "tier": ["three", "three", "two", "national"],
            }
        )
        cfg = self._config(
            tmp_path,
            df,
            "tidy",
            lockdown_states=["two", "three", "dec_two", "dec_three"],
        )
        xarr = TierData.process(cfg)
        assert xarr.dims == ("date", "code", "tier")
        assert list(xarr.coords["tier"]) == [
            "two",
            "three",
            "dec_two",
            "dec_three",
        ]
        # Before the split: plain tiers. After: dec_-prefixed.
        assert (
            xarr.sel(
                date="2020-12-01", code="E06000001", tier="three"
            ).item()
            == 1.0
        )
        assert (
            xarr.sel(
                date="2020-12-03", code="E06000001", tier="dec_three"
            ).item()
            == 1.0
        )
        assert (
            xarr.sel(
                date="2020-12-03", code="E06000001", tier="three"
            ).item()
            == 0.0
        )
        # 'national' is not a base tier: not renamed, and outside the
        # lockdown_states columns -> contributes no ones.
        assert (
            xarr.sel(date="2020-12-03", code="E06000002").sum().item() == 0.0
        )

    def test_lancs_format_is_dead(self, tmp_path):
        from covid19uk_tpu.data.tiers import TierData

        cfg = self._config(tmp_path, pd.DataFrame({"a": [1]}), "lancs_tidy")
        with pytest.raises(NotImplementedError):
            TierData.process(cfg)


class TestLegacyUtils:
    def test_generate_case_numbers_conserves_total(self):
        from covid19uk_tpu.utils.impute import generate_case_numbers

        rng = np.random.default_rng(3)
        n = np.array([40.0, 0.0, 7.0])
        out = generate_case_numbers(n, rate=0.4, rng=rng)
        assert out.ndim == 2 and out.shape[1] == 3
        np.testing.assert_allclose(out.sum(axis=0), n)
        assert (out >= 0).all()

    def test_generate_case_numbers_empty(self):
        from covid19uk_tpu.utils.impute import generate_case_numbers

        out = generate_case_numbers(
            np.zeros(2), rate=0.4, rng=np.random.default_rng(0)
        )
        assert out.shape == (0, 2)

    def test_filename_helpers(self):
        from covid19uk_tpu.data.util import (
            format_input_filename,
            format_output_filename,
        )

        cfg = {
            "Global": {
                "prependID": True,
                "prependID_Str": "run42",
                "prependDate": True,
            }
        }
        assert (
            format_input_filename("out/data.nc", cfg) == "out/run42_data.nc"
        )
        import datetime

        day = datetime.date(2020, 6, 1)
        assert (
            format_output_filename("out/post.h5", cfg, today=day)
            == "out/2020-06-01_run42_post.h5"
        )
        cfg["Global"]["prependID"] = False
        cfg["Global"]["prependDate"] = False
        assert format_output_filename("out/post.h5", cfg) == "out/post.h5"

    def test_load_config_and_sanitisers(self, tmp_path):
        from covid19uk_tpu.utils.settings import (
            load_config,
            sanitise_parameter,
            sanitise_settings,
        )

        path = tmp_path / "cfg.yaml"
        path.write_text(
            "ParamsToFit:\n  beta1: 0.3\n  gamma: 0.25\n"
            "settings:\n"
            "  inference_period: ['2020-03-01', '2020-06-01']\n"
            "  prediction_period: ['2020-06-01', '2020-07-01']\n"
            "  time_step: 1\n"
            "  holiday: ['2020-04-10']\n"
            "  lockdown: ['2020-03-23']\n"
        )
        cfg = load_config(path)
        params = sanitise_parameter(cfg["ParamsToFit"])
        assert params["beta1"].dtype == np.float64
        settings = sanitise_settings(cfg["settings"])
        assert settings["inference_period"].dtype.kind == "M"
        assert settings["time_step"] == 1.0
        assert settings["lockdown"][0] == np.datetime64("2020-03-23")
