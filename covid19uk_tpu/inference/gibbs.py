"""Metropolis-within-Gibbs composition: HMC on parameters + event kernels.

Replaces the reference's kernel stack (``inference/inference.py:86-101`` and
``mcmc_kernel_factory.py:116-168``):

    GibbsKernel([
      (0, HMC on the flat unconstrained parameter vector),
      (1, MultiScanKernel(num_event_time_updates,
            GibbsKernel([move S->E, move E->I, occult S->E, occult E->I]))),
    ])

as one pure jittable function ``(key, state, tunables) -> (state, trace)``.
Everything composes under ``vmap`` (chains) and ``shard_map`` (mesh).

The event sweep uses windowed delta likelihood evaluation
(:mod:`covid19uk_tpu.inference.likelihood`): the state tensor is computed
once per transition and threaded through the 20 kernel applications, each of
which touches only an O(window) slice instead of re-evaluating the O(M*T)
likelihood — measured ~10x cheaper at full-UK scale.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from covid19uk_tpu.inference import hmc
from covid19uk_tpu.inference.gamma_gibbs import GammaGibbsInfo, gamma_gibbs_step
from covid19uk_tpu.inference.event_kernels import (
    EventMoveInfo,
    compensated_move_step,
    compensated_pair_move_step,
    event_move_step,
    occult_step,
    pair_move_step,
)
from covid19uk_tpu.inference.likelihood import (
    WindowedEvaluator,
    _rate_diff_no_lgamma,
    make_context,
)
from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import constrain_parameters, unpack_parameters
from covid19uk_tpu.ops.pallas import fused_sweep as _fs


class ChainState(NamedTuple):
    """One chain's state: flat unconstrained params + latent event tensor."""

    u: jnp.ndarray  # [P]
    events: jnp.ndarray  # [M, T, X]


class HMCTunables(NamedTuple):
    step_size: jnp.ndarray
    inv_mass_diag: jnp.ndarray  # [P] posterior-variance estimate
    # Traced overrides of EventKernelConfig.move_decay, per move kernel
    # (None -> use the static config value).  The driver's Robbins–Monro
    # acceptance autotuning passes these through the jit boundary so a
    # retuned decay never recompiles the window program.
    move_decay_se: object = None
    move_decay_ei: object = None
    # Traced overrides of EventKernelConfig.x_decay for the MOVE kernels
    # only (occults/pairs keep the static config value).  Round-5 NI
    # telemetry showed move acceptance is *displacement*-decay-insensitive
    # at small scale — the autotuner marched move_decay 0.85 -> 0.50 with
    # acceptance pinned at 0.12-0.16 — because the binding rejection
    # factor is the number of events moved per proposal.  Tuning the
    # event-count decay alongside reaches the reference's ~0.23 band.
    x_decay_se: object = None
    x_decay_ei: object = None


class StepTrace(NamedTuple):
    """Per-draw trace mirroring the reference's results layout
    (``inference.py:245-282``): hmc/* plus four event-kernel blocks, plus
    the framework's compensated joint (gamma0, E->I) kernel."""

    hmc: hmc.HMCInfo
    move_se: EventMoveInfo
    move_ei: EventMoveInfo
    occult_se: EventMoveInfo
    occult_ei: EventMoveInfo
    comp_ei: EventMoveInfo  # zeros when compensate_gamma0 is off
    pair: EventMoveInfo  # zeros when num_pair_updates == 0
    gamma: GammaGibbsInfo  # zeros when gamma_gibbs is off


class EventKernelConfig(NamedTuple):
    """Static knobs (example_config.yaml:26-30)."""

    dmax: int = 84
    mmax: int = 2
    nmax: int = 25
    occult_nmax: int = 15
    num_event_time_updates: int = 5
    t_range: tuple = (0, 0)  # (T-21, T) — set by the driver
    move_decay: float = 0.9  # displacement-pmf decay; 1.0 = uniform
    x_decay: float = 0.9  # event-count-pmf decay; 1.0 = uniform
    # Joint (gamma0, E->I events) ridge move (event_kernels.py
    # compensated_move_step).  Measured neutral at NI scale — the binding
    # move penalty is the E-sojourn term, not I->R (see pair moves) — so
    # off by default; kept as a config option.
    compensate_gamma0: bool = False
    num_compensated_updates: int = 1
    # Episode-translation pair moves (event_kernels.py pair_move_step):
    # move an S->E event and a downstream E->I event together, preserving
    # the E-sojourn structure — the measured fix for the slow infectious-
    # person-time mode that throttles gamma0 ESS.  pair_mmax is separate
    # from mmax: each pair proposal costs 2 windowed deltas per location.
    num_pair_updates: int = 1
    pair_mmax: int = 1
    # Displacement decay for PAIR proposals, decoupled from move_decay:
    # episode translation removes the E-sojourn penalty, so long strides
    # stay acceptable (~0.18 at uniform) and carry the slow person-time
    # mode much further per accept.  Measured at UK scale (16 chains,
    # 1000 draws, 3 seeds): gamma0 ESS 27±6 -> 46±24 and min-scalar
    # ESS/sec 5.7±1.3 -> 7.0±0.8 going 0.9 -> 1.0 at zero wall cost,
    # while the plain kernels keep their 0.9 decay (their acceptance
    # collapses to ~0.01 at uniform).  1.0 = uniform over the valid range.
    pair_move_decay: float = 1.0
    # Compensate gamma0 along the removals/person-time ridge within each
    # pair proposal (event_kernels.compensated_pair_move_step): the pair
    # move removes the E-sojourn penalty, the deterministic gamma0
    # translation removes the I->R penalty — together large
    # person-time strides become acceptable, decorrelating gamma0.
    pair_compensate_gamma0: bool = False
    # Near-iid conditional refresh of (gamma0, gamma1) | events after the
    # event sweep (gamma_gibbs.gamma_gibbs_step): a Laplace independence-MH
    # draw from the exact 2-D conditional via the I->R per-day sufficient
    # statistics.  Measured NEGATIVE on gamma0 ESS at UK equilibrium
    # (23.3±1.7 vs 31.7±1.0 off) — the conditional is tight, so the
    # refresh slaves gamma0 to the slow person-time mode; useful only for
    # far-from-equilibrium starts.  Off by default.
    gamma_gibbs: bool = False
    # Guided occult location proposal (event_kernels.occult_step
    # guide_logits): sample the occult location ~ Categorical over a FIXED
    # data-derived weight — observed I->R cases summed over the occult
    # window, mixed with a uniform floor — instead of Uniform(M).  The
    # observed cases are exactly the tensor slice no kernel modifies, so
    # the weight is state-independent and the location factor cancels from
    # the Hastings ratio (same q(loc) forward and reverse); stationarity
    # is exact (tested).  "auto" guides at M >= 64: at NI scale (M=11)
    # uniform already accepts at 0.29-0.38, while at UK scale (M=380) it
    # collapses to ~0.000 because the epidemic's window mass sits in a
    # small fraction of locations (tools/diag_occult.py).  True/False
    # force.
    occult_guided: object = "auto"
    # Mixture weight of the uniform floor in the guided occult location
    # distribution — keeps every location proposable in both directions
    # (ergodicity: an imputation-born occult in a zero-case location must
    # remain deletable).
    occult_guide_floor: float = 0.1
    # Guided MOVE/PAIR location proposal (event_kernels._sample_locations):
    # sample the mmax locations ~ weighted-without-replacement over the
    # SAME fixed observed-case weights (full [0, T) window), instead of
    # uniform-without-replacement.  State-independent, so the location
    # factor cancels from the Hastings ratio (stationarity tested).
    # "auto" guides at M >= 64, same gate as occults: at UK scale the
    # event mass is concentrated in few locations and uniform draws waste
    # most proposals on near-empty rows.  True/False force.  Default OFF
    # until the UK-scale mixing A/B lands (round-5 discipline: no
    # unmeasured default flips).
    move_guided: object = "never"
    # Uniform-floor mixture weight for the guided move location weights.
    move_guide_floor: float = 0.1
    # Run the whole 4-kernel multiscan as ONE Pallas kernel per draw
    # (ops/pallas/fused_sweep): per-chain VMEM residency across all U x 4
    # MH applications + narrow-window E->I deltas — the launch-fusion
    # lever of docs/profile_uk.md.  Same proposals/Hastings/accept rules;
    # the binomial pmf uses the same Stirling forms at f32 (in-kernel
    # lgamma substitutes, error < 1e-5 — tests/test_fused_sweep.py).
    # "auto"/"always"/"never"/bool; "auto" currently resolves False (the
    # XLA path) — bench.py forces "always" at its measured operating
    # point.  Incompatible with compensate_gamma0 / gamma_gibbs /
    # move_guided (ValueError).  Pair updates compose: each multiscan
    # runs fused-4-kernels then the XLA pair kernel.
    fused_sweep: object = "never"
    # Thread the per-draw commute = Cstar @ (I/N) through the event sweep
    # (windowed deltas slice it instead of recomputing the [M,M]@[M,window]
    # product per eval; accepted E->I perturbations rank-1-update it).
    # "auto" threads at M >= 1024: measured same-session on v5e, threading
    # is 1.13x at M=7000/C=1 (the product dominates) but 0.95x at
    # M=380/C=16 (the product is tiny; the [C,M,T] carry extension and the
    # rank-1 full-T updates cost more than they save).  Round 5 re-test on
    # the single-apply stack at M=380/C=64: 1.03x (13.58 -> 13.19 ms/step)
    # — the gate can't see the chain count (it's an outer vmap dim), so
    # bench.py forces "always" at its C=64 operating point instead.
    # True/False/"always"/"never" force.
    thread_commute: object = "auto"


def case_guide_logits(events, t_range, floor):
    """Fixed data-derived location weights (log scale) for guided proposals.

    Observed I->R cases summed over ``[t_range[0], t_range[1])`` (the
    occult proposal window for occults; all of ``[0, T)`` for moves),
    mixed with a uniform floor so every location stays proposable in both
    directions.  ``events[..., 2]`` is never modified by any kernel
    (moves/occults/pairs target ids 0/1 only), so the weights are
    state-independent and the Hastings location factor cancels exactly
    (see ``occult_step``'s and ``_sample_locations``'s docstrings).

    Single source of truth for the production formula — the Gibbs driver
    and the diagnostics (``tools/diag_occult.py``) both call this.
    """
    M = events.shape[0]
    cases_w = jnp.sum(events[:, t_range[0]:t_range[1], 2], axis=1)
    total = jnp.sum(cases_w)
    return jnp.log(
        jnp.where(
            total > 0, (1.0 - floor) * cases_w / jnp.maximum(total, 1.0), 0.0
        )
        + floor / M
    )


def make_mcmc_step(
    model,
    num_leapfrog_steps: int,
    event_config: EventKernelConfig,
):
    """Builds the full MCMC transition kernel.

    Args:
      model: a :class:`covid19uk_tpu.models.spec.CovidUK` instance.
      num_leapfrog_steps: static leapfrog count (reference: 16).
      event_config: static event-kernel knobs.

    Returns:
      ``step(key, state, tune, model=None) -> (ChainState, StepTrace)``.
      When jitting at scale, pass the model as the explicit fourth argument
      (it is a registered pytree) so its covariate arrays are program
      *inputs*, not baked-in constants.
    """
    cfg = event_config
    T = model.num_steps
    M = model.data.num_locations
    if cfg.thread_commute == "auto":
        cfg = cfg._replace(thread_commute=M >= 1024)
    elif cfg.thread_commute == "always":
        cfg = cfg._replace(thread_commute=True)
    elif cfg.thread_commute == "never":
        cfg = cfg._replace(thread_commute=False)
    if not isinstance(cfg.thread_commute, bool):
        # Same footgun class as occult_guided: a stray truthy string
        # (e.g. "never") must not silently enable threading.
        raise ValueError(
            "thread_commute must be a bool or one of 'auto'/'always'/"
            f"'never', got {event_config.thread_commute!r}"
        )
    # Resolve the occult_guided vocabulary to a bool and REJECT anything
    # else: a stray truthy string (e.g. "never" passed straight to the
    # NamedTuple instead of through the driver/CLI mapping) must not
    # silently enable guiding.
    for field in ("occult_guided", "move_guided"):
        val = getattr(cfg, field)
        if val == "auto":
            cfg = cfg._replace(**{field: M >= 64})
        elif val == "always":
            cfg = cfg._replace(**{field: True})
        elif val == "never":
            cfg = cfg._replace(**{field: False})
        if not isinstance(getattr(cfg, field), bool):
            raise ValueError(
                f"{field} must be a bool or one of 'auto'/'always'/'never',"
                f" got {getattr(event_config, field)!r}"
            )
    for field in ("occult_guide_floor", "move_guide_floor"):
        val = getattr(cfg, field)
        if not (0.0 < val <= 1.0):
            raise ValueError(f"{field} must be in (0, 1], got {val!r}")
    if cfg.fused_sweep == "auto":
        cfg = cfg._replace(fused_sweep=False)
    elif cfg.fused_sweep == "always":
        cfg = cfg._replace(fused_sweep=True)
    elif cfg.fused_sweep == "never":
        cfg = cfg._replace(fused_sweep=False)
    if not isinstance(cfg.fused_sweep, bool):
        raise ValueError(
            "fused_sweep must be a bool or one of 'auto'/'always'/'never',"
            f" got {event_config.fused_sweep!r}"
        )
    if cfg.fused_sweep and (
        cfg.compensate_gamma0
        or cfg.gamma_gibbs
        or cfg.move_guided
        or (cfg.num_pair_updates > 0 and cfg.pair_compensate_gamma0)
    ):
        raise ValueError(
            "fused_sweep is incompatible with compensate_gamma0 / "
            "gamma_gibbs / move_guided / pair_compensate_gamma0 — "
            "disable them or use the XLA sweep"
        )
    move_window = min(cfg.dmax + 1, T)
    if not (0 <= cfg.t_range[0] < cfg.t_range[1] <= T):
        raise ValueError(
            f"t_range={cfg.t_range} must satisfy 0 <= lo < hi <= T={T}"
        )
    # An occult at time t perturbs the state at ALL t' > t, so the delta
    # window must span [t_range[0], T) — the proposal range alone is only
    # sufficient when t_range ends at T (the reference's (T-21, T) contract,
    # inference.py:334-341; EventKernelConfig accepts any range).
    occult_window = T - cfg.t_range[0]
    closed_model = model

    from covid19uk_tpu.models.spec import constrain_log_det_jacobian

    def step(key, state: ChainState, tune: HMCTunables, model=None):
        model = closed_model if model is None else model
        k_hmc, k_events = jax.random.split(key)

        # The state timeseries depends only on the events, which HMC holds
        # fixed — compute it ONCE here instead of inside every leapfrog
        # gradient (XLA does not hoist the cumsum out of the scan; measured
        # 3x on the bare gradient at full-UK scale).  Ditto the commuting
        # matvec Cstar @ (I/N) and — via reduced_loglik_fn — every
        # parameter-independent piece of the likelihood (lgammas, the whole
        # constant-rate E->I term, the I->R location reduction), leaving
        # each leapfrog gradient one [M, T] rate term.
        full_state = seir.compute_state(model.initial_state, state.events)
        commute = model.commute_pressure(full_state[..., 2])
        loglik = model.reduced_loglik_fn(state.events, full_state, commute)

        def logdensity(u):
            params = unpack_parameters(constrain_parameters(u), T, M)
            return (
                model.log_prior(params)
                + loglik(params)
                + constrain_log_det_jacobian(u)
            )

        # --- position 0: HMC on params | events -------------------------
        u_new, hmc_info = hmc.hmc_step(
            k_hmc,
            state.u,
            logdensity,
            tune.step_size,
            num_leapfrog_steps,
            tune.inv_mass_diag,
        )

        # --- position 1: MultiScan x N of Gibbs over 4 event kernels ----
        params = unpack_parameters(constrain_parameters(u_new), T, M)
        ctx0 = make_context(model, params)
        dtype = state.u.dtype

        logp0 = hmc_info.target_log_prob  # logp(u_new, old events)
        g0_init = u_new[3]  # gamma0 (identity bijection at index 3)

        if cfg.occult_guided and not cfg.fused_sweep:
            # Computed once per draw; see case_guide_logits for the
            # state-independence / Hastings-cancellation argument.  The
            # fused kernel computes the identical weights in-kernel.
            guide_logits = case_guide_logits(
                state.events, cfg.t_range, cfg.occult_guide_floor
            )
        else:
            guide_logits = None
        if cfg.move_guided:
            move_guide = case_guide_logits(
                state.events, (0, T), cfg.move_guide_floor
            )
        else:
            move_guide = None

        md_se = (
            cfg.move_decay
            if tune.move_decay_se is None
            else tune.move_decay_se
        )
        md_ei = (
            cfg.move_decay
            if tune.move_decay_ei is None
            else tune.move_decay_ei
        )
        xd_se = cfg.x_decay if tune.x_decay_se is None else tune.x_decay_se
        xd_ei = cfg.x_decay if tune.x_decay_ei is None else tune.x_decay_ei

        if cfg.fused_sweep:
            # ---- fused Pallas sweep: all U multiscans in ONE launch ----
            # (ops/pallas/fused_sweep: per-chain VMEM residency across the
            # U x 4 MH applications).  Kernel ORDER within a Gibbs sweep
            # does not affect stationarity — each component kernel is
            # individually reversible w.r.t. the same target — so the pair
            # updates run as one XLA scan AFTER the fused multiscans
            # instead of interleaved; per-draw application counts match
            # the XLA path exactly (U x 4 + U * num_pair_updates).
            k_fused, k_pair = jax.random.split(k_events)
            ev_f, st_f, cm_f, logp_f, tr = _fs.fused_sweep(
                k_fused, state.events, full_state, commute, logp0,
                ctx0.exp_eta, ctx0.psi_w, ctx0.rate_ir_t, ctx0.N,
                ctx0.Cstar, md_se, md_ei, cfg.x_decay,
                x_decay_se=xd_se, x_decay_ei=xd_ei,
                mmax=cfg.mmax, nmax=cfg.nmax, dmax=cfg.dmax,
                occult_nmax=cfg.occult_nmax, t_range=cfg.t_range,
                num_updates=cfg.num_event_time_updates,
                occult_guided=cfg.occult_guided,
                guide_floor=cfg.occult_guide_floor,
                interpret=jax.default_backend() != "tpu",
            )

            # Adapt the kernel's [4, 2 + 4*mmax] trace block to the
            # StepTrace contract (rows: move_se, move_ei, occult_se,
            # occult_ei of the LAST multiscan — gemlib MultiScanKernel).
            def _move_info(r):
                c = [2 + j * cfg.mmax for j in range(5)]
                return EventMoveInfo(
                    is_accepted=tr[r, 0] > 0.5,
                    target_log_prob=tr[r, 1].astype(dtype),
                    m=tr[r, c[0]:c[1]].astype(dtype),
                    t=tr[r, c[1]:c[2]].astype(dtype),
                    delta_t=tr[r, c[2]:c[3]].astype(dtype),
                    x_star=tr[r, c[3]:c[4]].astype(dtype),
                )

            def _occ_info(r):
                return EventMoveInfo(
                    is_accepted=tr[r, 0] > 0.5,
                    target_log_prob=tr[r, 1].astype(dtype),
                    m=tr[r, 2].astype(dtype),
                    t=tr[r, 3].astype(dtype),
                    delta_t=tr[r, 4].astype(dtype),
                    x_star=tr[r, 5].astype(dtype),
                )

            def _zero_info(n):
                return EventMoveInfo(
                    is_accepted=jnp.zeros((), bool),
                    target_log_prob=logp_f.astype(dtype),
                    m=jnp.zeros((n,), dtype),
                    t=jnp.zeros((n,), dtype),
                    delta_t=jnp.zeros((n,), dtype),
                    x_star=jnp.zeros((n,), dtype),
                )

            if cfg.num_pair_updates > 0:
                # Commute stays threaded here regardless of
                # cfg.thread_commute: the fused kernel keeps it live in
                # VMEM and returns it exact, so the rank-1 update is free
                # accuracy (the next draw's sweep needs it fresh anyway).
                move_eval = WindowedEvaluator(ctx=ctx0, window=move_window)

                def pair_scan(carry, kp):
                    ev, st, cm, lp = carry
                    ev, st, cm, lp, info = pair_move_step(
                        kp, ev, st, lp, move_eval,
                        cfg.dmax, cfg.pair_mmax, cfg.nmax,
                        cfg.pair_move_decay, cfg.x_decay,
                        commute=cm, guide_logits=None,
                    )
                    return (ev, st, cm, lp), info

                n_pair = cfg.num_event_time_updates * cfg.num_pair_updates
                (ev_f, st_f, _, logp_f), pinfos = jax.lax.scan(
                    pair_scan, (ev_f, st_f, cm_f, logp_f),
                    jax.random.split(k_pair, n_pair),
                )
                i_pair = jax.tree.map(lambda x: x[-1], pinfos)
            else:
                i_pair = _zero_info(cfg.pair_mmax)

            trace = StepTrace(
                hmc=hmc_info,
                move_se=_move_info(0),
                move_ei=_move_info(1),
                occult_se=_occ_info(2),
                occult_ei=_occ_info(3),
                comp_ei=_zero_info(cfg.mmax),
                pair=i_pair,
                gamma=GammaGibbsInfo(
                    is_accepted=jnp.zeros((), bool),
                    log_accept_ratio=jnp.zeros((), dtype),
                ),
            )
            return ChainState(u=u_new, events=ev_f), trace

        def potential(st):
            # log infectious person-time: the gamma0 likelihood ridge is
            # exp(gamma0) * PT ~ total removals (see compensated_move_step)
            return jnp.log(jnp.maximum(jnp.sum(st[..., 2]), 1.0))

        def sweep(carry, k):
            events, st, commute_carry, logp, g0, rate_ir_t = carry
            # The per-draw commute (parameter-independent) is threaded
            # through every kernel: windowed deltas *slice* it instead of
            # recomputing the [M,M]@[M,window] product per eval (the
            # dominant FLOPs of the sweep at MSOA scale), and accepted
            # E->I perturbations keep it live via rank-1 updates.  The
            # unthreaded variant (the A/B knob) passes None and kernels
            # return the shorter tuples; unpack() normalizes arity.
            commute_live = commute_carry if cfg.thread_commute else None

            def unpack(res):
                if cfg.thread_commute:
                    return res  # (ev, st, commute, logp, info)
                ev, st_, lp, info = res
                return ev, st_, None, lp, info

            # gamma0 may have moved last iteration — refresh the context's
            # I->R rates so every windowed delta sees the live value.
            ctx = ctx0._replace(rate_ir_t=rate_ir_t)
            move_eval = WindowedEvaluator(ctx=ctx, window=move_window)
            occ_eval = WindowedEvaluator(ctx=ctx, window=occult_window)
            ka, kb, kc, kd, ke, kf = jax.random.split(k, 6)
            events, st, commute_live, logp, i_mse = unpack(event_move_step(
                ka, events, st, logp, move_eval, 0,
                cfg.dmax, cfg.mmax, cfg.nmax, md_se, xd_se,
                commute=commute_live, guide_logits=move_guide,
            ))
            events, st, commute_live, logp, i_mei = unpack(event_move_step(
                kb, events, st, logp, move_eval, 1,
                cfg.dmax, cfg.mmax, cfg.nmax, md_ei, xd_ei,
                commute=commute_live, guide_logits=move_guide,
            ))
            events, st, commute_live, logp, i_ose = unpack(occult_step(
                kc, events, st, logp, occ_eval, 0,
                cfg.t_range, cfg.occult_nmax, cfg.x_decay,
                guide_logits=guide_logits, commute=commute_live,
            ))
            events, st, commute_live, logp, i_oei = unpack(occult_step(
                kd, events, st, logp, occ_eval, 1,
                cfg.t_range, cfg.occult_nmax, cfg.x_decay,
                guide_logits=guide_logits, commute=commute_live,
            ))
            def make_gamma_delta(live_rate):
                def gamma_delta(ev_new, st_new, g, g_new):
                    # All gamma0-dependent terms at the proposed events:
                    # I->R likelihood is rate-only (lgammas cancel) +
                    # N(0, 100) prior (model_spec.py:197).
                    r_old = live_rate[None, :]
                    r_new = r_old * jnp.exp(g_new - g)
                    d_ir = jnp.sum(
                        _rate_diff_no_lgamma(
                            st_new[..., 2], ev_new[..., 2], r_old, r_new
                        )
                    )
                    d_prior = -0.5 * (g_new**2 - g**2) / 100.0**2
                    return d_ir + d_prior

                return gamma_delta

            if cfg.num_pair_updates > 0 and cfg.pair_compensate_gamma0:
                g0_pb = g0  # rate_ir_t corresponds to this value
                for kp in jax.random.split(kf, cfg.num_pair_updates):
                    live_rate = rate_ir_t * jnp.exp(g0 - g0_pb)
                    pair_eval = WindowedEvaluator(
                        ctx=ctx._replace(rate_ir_t=live_rate),
                        window=move_window,
                    )
                    res = compensated_pair_move_step(
                        kp, events, st, logp, pair_eval, g0, potential,
                        make_gamma_delta(live_rate),
                        cfg.dmax, cfg.pair_mmax, cfg.nmax,
                        cfg.pair_move_decay, cfg.x_decay,
                        commute=commute_live, guide_logits=move_guide,
                    )
                    if cfg.thread_commute:
                        events, st, commute_live, logp, g0, i_pair = res
                    else:
                        events, st, logp, g0, i_pair = res
                rate_ir_t = rate_ir_t * jnp.exp(g0 - g0_pb)
            elif cfg.num_pair_updates > 0:
                for kp in jax.random.split(kf, cfg.num_pair_updates):
                    events, st, commute_live, logp, i_pair = unpack(
                        pair_move_step(
                            kp, events, st, logp, move_eval,
                            cfg.dmax, cfg.pair_mmax, cfg.nmax,
                            cfg.pair_move_decay, cfg.x_decay,
                            commute=commute_live, guide_logits=move_guide,
                        )
                    )
            else:
                i_pair = EventMoveInfo(
                    is_accepted=jnp.zeros((), bool),
                    target_log_prob=logp,
                    m=jnp.zeros((cfg.pair_mmax,), dtype),
                    t=jnp.zeros((cfg.pair_mmax,), dtype),
                    delta_t=jnp.zeros((cfg.pair_mmax,), dtype),
                    x_star=jnp.zeros((cfg.pair_mmax,), dtype),
                )
            if cfg.compensate_gamma0:
                g0_before = g0  # rate_ir_t corresponds to this value
                for kk in jax.random.split(ke, cfg.num_compensated_updates):
                    # Rates must track the live g0 across repeats (both in
                    # the windowed event delta's I->R terms and in the
                    # gamma delta) — an accept mid-loop changes them.
                    live_rate = rate_ir_t * jnp.exp(g0 - g0_before)
                    cur_eval = WindowedEvaluator(
                        ctx=ctx._replace(rate_ir_t=live_rate),
                        window=move_window,
                    )
                    res = compensated_move_step(
                        kk, events, st, logp, cur_eval, g0, potential,
                        make_gamma_delta(live_rate), 1,
                        cfg.dmax, cfg.mmax, cfg.nmax, cfg.move_decay,
                        cfg.x_decay, commute=commute_live,
                        guide_logits=move_guide,
                    )
                    if cfg.thread_commute:
                        events, st, commute_live, logp, g0, i_cmp = res
                    else:
                        events, st, logp, g0, i_cmp = res
                rate_ir_t = rate_ir_t * jnp.exp(g0 - g0_before)
            else:
                i_cmp = EventMoveInfo(
                    is_accepted=jnp.zeros((), bool),
                    target_log_prob=logp,
                    m=jnp.zeros((cfg.mmax,), dtype),
                    t=jnp.zeros((cfg.mmax,), dtype),
                    delta_t=jnp.zeros((cfg.mmax,), dtype),
                    x_star=jnp.zeros((cfg.mmax,), dtype),
                )
            commute_out = (
                commute_live if cfg.thread_commute else commute_carry
            )
            return (events, st, commute_out, logp, g0, rate_ir_t), (
                i_mse, i_mei, i_ose, i_oei, i_cmp, i_pair,
            )

        k_events, k_gamma = jax.random.split(k_events)
        scan_keys = jax.random.split(k_events, cfg.num_event_time_updates)
        (events_new, state_new, _, _, g0_new, _), infos = jax.lax.scan(
            sweep,
            (state.events, full_state, commute, logp0, g0_init,
             ctx0.rate_ir_t),
            scan_keys,
        )
        u_new = u_new.at[3].set(g0_new)

        if cfg.gamma_gibbs:
            d = model.data
            t_abs = model.initial_step + jnp.arange(T)
            wd = d.weekday[jnp.clip(t_abs, 0, d.weekday.shape[0] - 1)]
            g_new, gamma_info = gamma_gibbs_step(
                k_gamma,
                jnp.stack([u_new[3], u_new[4]]),
                jnp.sum(events_new[..., 2], axis=0),
                jnp.sum(state_new[..., 2], axis=0),
                wd,
            )
            u_new = u_new.at[3].set(g_new[0]).at[4].set(g_new[1])
        else:
            gamma_info = GammaGibbsInfo(
                is_accepted=jnp.zeros((), bool),
                log_accept_ratio=jnp.zeros((), dtype),
            )
        # MultiScanKernel returns the *last* scan's results
        # (SURVEY.md §2.9; gemlib.MultiScanKernel contract).
        last = jax.tree.map(lambda x: x[-1], infos)

        trace = StepTrace(
            hmc=hmc_info,
            move_se=last[0],
            move_ei=last[1],
            occult_se=last[2],
            occult_ei=last[3],
            comp_ei=last[4],
            pair=last[5],
            gamma=gamma_info,
        )
        return ChainState(u=u_new, events=events_new), trace

    return step
