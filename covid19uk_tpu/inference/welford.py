"""Welford online variance accumulator.

Functional replacement for TFP's ``RunningVariance`` as used by the
reference's mass-matrix adaptation
(``/root/reference/covid19uk/inference/inference.py:36-47`` and
``DiagonalMassMatrixAdaptation`` at ``mcmc_kernel_factory.py:47-60``).
Pure pytree state — vmappable over chains and psum-poolable over a mesh.
"""

from typing import NamedTuple

import jax.numpy as jnp


class RunningVariance(NamedTuple):
    count: jnp.ndarray  # scalar (float for weighting flexibility)
    mean: jnp.ndarray  # [P]
    m2: jnp.ndarray  # [P] sum of squared deviations


def init(shape, dtype=jnp.float32) -> RunningVariance:
    return RunningVariance(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros(shape, dtype),
        m2=jnp.zeros(shape, dtype),
    )


def from_stats(num_samples, mean, variance) -> RunningVariance:
    """Seeds the accumulator from precomputed moments.

    Mirrors ``RunningVariance.from_stats`` usage at
    ``inference.py:44-46``: the reference seeds each slow window from the
    mean/variance of the previous window's last half.
    """
    num_samples = jnp.asarray(num_samples, mean.dtype)
    return RunningVariance(
        count=num_samples, mean=mean, m2=variance * num_samples
    )


def update(state: RunningVariance, x) -> RunningVariance:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return RunningVariance(count, mean, m2)


def variance(state: RunningVariance, ddof=0.0):
    denom = jnp.maximum(state.count - ddof, 1.0)
    return state.m2 / denom


def from_draws(draws) -> RunningVariance:
    """Seeds from the last half of a window of draws ``[num_draws, P]``.

    Mirrors ``get_weighted_running_variance`` (inference.py:36-47).
    """
    half = draws[draws.shape[0] // 2 :]
    n = jnp.asarray(half.shape[0], draws.dtype)
    mean = jnp.mean(half, axis=0)
    var = jnp.var(half, axis=0)
    return from_stats(n, mean, var)
