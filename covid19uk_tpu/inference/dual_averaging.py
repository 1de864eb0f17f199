"""Dual-averaging step-size adaptation (Nesterov / Hoffman-Gelman).

Functional replacement for TFP's ``DualAveragingStepSizeAdaptation`` as
configured by the reference (``inference/inference.py:330-333``:
target_accept_prob=0.75; windows sized per the Stan-style schedule).

Defaults follow TFP/Stan: shrinkage target mu = log(10 * init_step),
gamma (exploration shrinkage) = 0.05, t0 = 10, kappa (decay rate) = 0.75.
The per-step step size is ``exp(x_t)`` (the non-averaged iterate), matching
the reference's use of the final kernel-results step size at window ends
(``inference.py:120,183``); the averaged iterate ``exp(x_bar)`` is also
carried for diagnostics.
"""

from typing import NamedTuple

import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray  # x_t
    log_step_avg: jnp.ndarray  # x_bar
    error_sum: jnp.ndarray  # running sum of (target - accept_prob)
    mu: jnp.ndarray  # shrinkage target
    step_count: jnp.ndarray  # t


def init(initial_step_size, dtype=jnp.float32) -> DualAveragingState:
    log_step = jnp.log(jnp.asarray(initial_step_size, dtype))
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step,
        error_sum=jnp.zeros((), dtype),
        mu=jnp.log(10.0 * jnp.asarray(initial_step_size, dtype)),
        step_count=jnp.zeros((), dtype),
    )


def update(
    state: DualAveragingState,
    accept_prob,
    target_accept_prob=0.75,
    gamma=0.05,
    t0=10.0,
    kappa=0.75,
) -> DualAveragingState:
    t = state.step_count + 1.0
    error_sum = state.error_sum + (target_accept_prob - accept_prob)
    # classic form: mu - sqrt(t)/gamma * (1/(t+t0)) * error_sum
    log_step = state.mu - jnp.sqrt(t) / (gamma * (t + t0)) * error_sum
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step_avg,
        error_sum=error_sum,
        mu=state.mu,
        step_count=t,
    )


def step_size(state: DualAveragingState):
    return jnp.exp(state.log_step)


def averaged_step_size(state: DualAveragingState):
    return jnp.exp(state.log_step_avg)
