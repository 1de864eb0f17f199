"""Exact-value tests for the stable binomial log-pmf primitives."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats, special

from covid19uk_tpu.ops.binomial import (
    lgamma_diff,
    log_choose,
    binomial_log_pmf_from_rate,
)


def test_lgamma_diff_small_exact():
    n = np.array([0.0, 1.0, 5.0, 9.0])
    k = np.array([0.0, 1.0, 3.0, 9.0])
    got = np.asarray(lgamma_diff(jnp.float64(n), jnp.float64(k)))
    want = special.gammaln(n + 1) - special.gammaln(n - k + 1)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_lgamma_diff_large_stirling_f64():
    n = np.array([1e4, 1e6, 2e6, 1e8])
    k = np.array([3.0, 150.0, 2000.0, 1.0])
    got = np.asarray(lgamma_diff(jnp.float64(n), jnp.float64(k)))
    want = special.gammaln(n + 1) - special.gammaln(n - k + 1)
    # the scipy reference itself loses ~1e-8 relative to cancellation
    # (difference of two ~1e9 lgammas at n=1e8); our Stirling form does not.
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_lgamma_diff_large_stirling_f32_beats_direct():
    """float32 Stirling form must be accurate where direct lgamma cancels."""
    n = np.float32(1.9e6)
    k = np.float32(137.0)
    want = special.gammaln(np.float64(n) + 1) - special.gammaln(
        np.float64(n) - np.float64(k) + 1
    )
    got = float(lgamma_diff(jnp.float32(n), jnp.float32(k)))
    # want ~ 1985; direct f32 would err by O(1). Demand 1e-3 relative.
    assert abs(got - want) / abs(want) < 1e-3


def test_log_choose_matches_scipy():
    n = np.array([10.0, 100.0, 1e6])
    k = np.array([4.0, 37.0, 250.0])
    got = np.asarray(log_choose(jnp.float64(n), jnp.float64(k)))
    want = special.gammaln(n + 1) - special.gammaln(k + 1) - special.gammaln(
        n - k + 1
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_binomial_log_pmf_from_rate_matches_scipy():
    rate = np.array([0.3, 1e-5, 2.0])
    n = np.array([50.0, 1.5e6, 7.0])
    k = np.array([12.0, 20.0, 7.0])
    p = 1.0 - np.exp(-rate)
    want = stats.binom.logpmf(k, n, p)
    got = np.asarray(
        binomial_log_pmf_from_rate(
            jnp.float64(n), jnp.float64(k), jnp.float64(rate)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_binomial_log_pmf_invalid_is_neg_inf():
    got = binomial_log_pmf_from_rate(
        jnp.float64(np.array([5.0, 5.0, -1.0])),
        jnp.float64(np.array([6.0, -1.0, 0.0])),
        jnp.float64(np.array([0.5, 0.5, 0.5])),
    )
    assert np.all(np.isneginf(np.asarray(got)))


def test_binomial_log_pmf_grad_finite():
    import jax

    def f(rate):
        return binomial_log_pmf_from_rate(
            jnp.float64(1000.0), jnp.float64(3.0), rate
        )

    g = jax.grad(f)(jnp.float64(0.01))
    assert np.isfinite(g)
    # analytical: d/dr [k log(1-e^-r) - (n-k) r] = k e^-r/(1-e^-r) - (n-k)
    want = 3.0 * np.exp(-0.01) / (1 - np.exp(-0.01)) - 997.0
    np.testing.assert_allclose(float(g), want, rtol=1e-9)
