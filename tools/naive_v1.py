"""FROZEN naive baseline implementation — do not optimize.

This is the reproducible CPU-baseline sampler for ``bench.py``: the same
Markov chain (identical HMC + event-kernel proposals, hence identical
ESS-per-draw) evaluated the way the TF reference evaluates it —

* the joint density is recomputed **from scratch** for every HMC leapfrog
  step (``compute_state`` cumsum + full ``[M, T, 3]`` likelihood inside the
  gradient, as TFP does with the reference's ``target_log_prob_fn``,
  reference ``inference/inference.py:537-557``);
* every event/occult MH proposal re-evaluates the **full** O(M*T)
  likelihood twice (gemlib's ``UncalibratedEventTimesUpdate`` contract —
  no windowed delta evaluation, no hoisting of parameter-independent
  terms).

Because the proposal distributions match the production sampler exactly,
ESS-per-draw is the same by construction; only wall-clock differs.  That
makes ``naive steps/sec x ESS-per-draw`` an honest CPU ESS/sec denominator
(see bench.py).

Any edit that changes the evaluation strategy here invalidates the frozen
baseline in bench.py — re-run ``tools/measure_cpu_baseline.py`` and update
the constant if this file must change.
"""

import jax
import jax.numpy as jnp

from covid19uk_tpu.inference import hmc
from covid19uk_tpu.inference.event_kernels import event_move_step, occult_step
from covid19uk_tpu.inference.gibbs import ChainState, EventKernelConfig
from covid19uk_tpu.inference.likelihood import FullEvaluator
from covid19uk_tpu.models import seir


def make_naive_step(model, num_leapfrog_steps, cfg: EventKernelConfig):
    """The naive (full-reevaluation) MCMC transition.

    Same signature contract as ``gibbs.make_mcmc_step``'s output, minus the
    trace (only the new state is returned — the baseline measures
    throughput).
    """

    def step(key, state: ChainState, tune):
        k_hmc, k_events = jax.random.split(key)

        # NAIVE: the full joint density — including the compute_state
        # cumsum, the commuting matmul, and the CAR quadratic form — is
        # traced into every leapfrog gradient evaluation.
        def logdensity(u):
            return model.joint_log_prob_unconstrained(u, state.events)

        u_new, hmc_info = hmc.hmc_step(
            k_hmc,
            state.u,
            logdensity,
            tune.step_size,
            num_leapfrog_steps,
            tune.inv_mass_diag,
        )

        # NAIVE: every proposal's delta = logp(new) - logp(old), both full.
        def logp_events(events):
            return model.joint_log_prob_unconstrained(u_new, events)

        evaluator = FullEvaluator(logp_fn=logp_events)
        full_state = seir.compute_state(model.initial_state, state.events)
        logp0 = logp_events(state.events)

        def sweep(carry, k):
            events, st, logp = carry
            ka, kb, kc, kd = jax.random.split(k, 4)
            events, st, logp, _ = event_move_step(
                ka, events, st, logp, evaluator, 0,
                cfg.dmax, cfg.mmax, cfg.nmax, cfg.move_decay, cfg.x_decay,
            )
            events, st, logp, _ = event_move_step(
                kb, events, st, logp, evaluator, 1,
                cfg.dmax, cfg.mmax, cfg.nmax, cfg.move_decay, cfg.x_decay,
            )
            events, st, logp, _ = occult_step(
                kc, events, st, logp, evaluator, 0,
                cfg.t_range, cfg.occult_nmax, cfg.x_decay,
            )
            events, st, logp, _ = occult_step(
                kd, events, st, logp, evaluator, 1,
                cfg.t_range, cfg.occult_nmax, cfg.x_decay,
            )
            return (events, st, logp), None

        scan_keys = jax.random.split(k_events, cfg.num_event_time_updates)
        (events_new, _, _), _ = jax.lax.scan(
            sweep, (state.events, full_state, logp0), scan_keys
        )
        return ChainState(u=u_new, events=events_new)

    return step
