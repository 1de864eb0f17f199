"""Stan-style windowed warmup: fast / slow-doubling / fast.

Replaces the reference's ``_fast_adapt_window`` / ``_slow_adapt_window`` /
``run_mcmc`` schedule (``/root/reference/covid19uk/inference/inference.py:
59-196, 303-441``): a 200-draw fast window (step size only), six slow
windows of 25*2^k draws (step size + diagonal mass), a 50-draw fast window,
then fixed-tuning sampling bursts.

Each window is one jitted ``lax.scan``; adaptation state (dual averaging,
Welford) lives in the scan carry, so a window is a single XLA program —
the reference's structure, without the TF retracing overhead.  The window
runner is vmapped over a leading chain axis by the driver.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from covid19uk_tpu.inference import dual_averaging, welford
from covid19uk_tpu.inference.gibbs import ChainState, HMCTunables


class WarmupSchedule(NamedTuple):
    """Window sizes (reference inference.py:312-321)."""

    first_window: int = 200
    slow_window: int = 25
    num_slow_windows: int = 6
    last_window: int = 50

    @property
    def total(self):
        return (
            self.first_window
            + self.slow_window * (2**self.num_slow_windows - 1)
            + self.last_window
        )


def regularized_variance(wf: welford.RunningVariance):
    """Stan-style shrinkage of the variance estimate toward 1e-3 I."""
    n = wf.count
    var = welford.variance(wf)
    return (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))


def make_window_runner(mcmc_step, num_draws: int, adapt_mass: bool):
    """Builds a jitted window runner.

    Args:
      mcmc_step: ``(key, ChainState, HMCTunables) -> (ChainState, StepTrace)``.
      num_draws: static window length.
      adapt_mass: if True, update the Welford accumulator with each draw and
        refresh the mass matrix every step (slow window); else mass is
        frozen (fast window).

    Returns:
      ``run(key, state, da_state, wf_state, inv_mass)``
        -> (state, da_state, wf_state, inv_mass, draws, traces)
      where draws/traces have a leading ``num_draws`` axis.
    """

    def run(key, state: ChainState, da_state, wf_state, inv_mass,
            model=None, decays=None):
        def body(carry, k):
            state, da, wf, inv_mass = carry
            tune = HMCTunables(
                step_size=dual_averaging.step_size(da),
                inv_mass_diag=inv_mass,
                move_decay_se=None if decays is None else decays[0],
                move_decay_ei=None if decays is None else decays[1],
                # event-count decays (4-tuple from the round-5 autotuner;
                # 2-tuples from older callers leave them at config)
                x_decay_se=(
                    decays[2] if decays is not None and len(decays) > 2
                    else None
                ),
                x_decay_ei=(
                    decays[3] if decays is not None and len(decays) > 3
                    else None
                ),
            )
            state, trace = mcmc_step(k, state, tune, model)
            accept = jnp.exp(
                jnp.minimum(trace.hmc.log_accept_ratio, 0.0)
            )
            accept = jnp.where(jnp.isfinite(accept), accept, 0.0)
            da = dual_averaging.update(da, accept)
            if adapt_mass:
                wf = welford.update(wf, state.u)
                inv_mass = regularized_variance(wf)
            return (state, da, wf, inv_mass), (state, trace)

        keys = jax.random.split(key, num_draws)
        (state, da, wf, inv_mass), (draws, traces) = jax.lax.scan(
            body, (state, da_state, wf_state, inv_mass), keys
        )
        return state, da, wf, inv_mass, draws, traces

    return run


def make_fixed_runner(mcmc_step, num_draws: int):
    """Fixed-tuning sampling burst (reference make_fixed_window_sampler,
    inference.py:199-242)."""

    def run(key, state: ChainState, step_size, inv_mass, model=None,
            decays=None):
        tune = HMCTunables(
            step_size=step_size,
            inv_mass_diag=inv_mass,
            move_decay_se=None if decays is None else decays[0],
            move_decay_ei=None if decays is None else decays[1],
            x_decay_se=(
                decays[2] if decays is not None and len(decays) > 2
                else None
            ),
            x_decay_ei=(
                decays[3] if decays is not None and len(decays) > 3
                else None
            ),
        )

        def body(state, k):
            state, trace = mcmc_step(k, state, tune, model)
            return state, (state, trace)

        keys = jax.random.split(key, num_draws)
        state, (draws, traces) = jax.lax.scan(body, state, keys)
        return state, draws, traces

    return run
