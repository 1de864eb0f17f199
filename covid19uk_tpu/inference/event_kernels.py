"""Jittable MH kernels on the latent ``[M, T, X]`` event tensor.

TPU-native replacements for gemlib's ``UncalibratedEventTimesUpdate`` and
``UncalibratedOccultUpdate`` (behavioral contract per call sites
``/root/reference/covid19uk/inference/mcmc_kernel_factory.py:63-113`` and
knobs in ``example_config.yaml:26-30``: dmax=84, nmax=25, m=2,
occult_nmax=15, occult moves restricted to the last 21 days).

Where gemlib constrains proposals to be valid-by-construction, we use
**rejection-by-density**: the chain-binomial log-likelihood returns ``-inf``
for any event tensor implying a negative compartment, so invalid proposals
are rejected by the MH step.  Both kernels are exactly reversible: the
Hastings correction accounts for the state-dependent proposal supports
(number of nonzero source times, event-count caps).  Acceptance *rates*
may differ from gemlib's proposal; the invariant distribution does not.

Likelihood changes are computed through an *evaluator*
(:mod:`covid19uk_tpu.inference.likelihood`): either full re-evaluation
(generic, O(M*T) — used by the stationarity unit tests) or windowed delta
evaluation (model-specific, O(window) — the production path).  A ``state``
tensor is threaded alongside the events and kept incrementally consistent.

All kernels are pure fixed-shape functions — vmappable over chains,
shardable over a mesh.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from covid19uk_tpu.inference.likelihood import (
    apply_event_delta,
    apply_event_deltas,
)


class EventMoveInfo(NamedTuple):
    """Per-draw trace, mirroring the reference's
    ``results/move|occult/*`` layout (inference.py:262-274)."""

    is_accepted: jnp.ndarray
    target_log_prob: jnp.ndarray
    m: jnp.ndarray  # proposed location index/indices
    t: jnp.ndarray  # proposed source time(s)
    delta_t: jnp.ndarray  # time displacement (moves) or +/-1 (occults)
    x_star: jnp.ndarray  # number of events moved/added/deleted


def _sample_locations(key, M, mmax, guide_logits=None):
    """Samples ``mmax`` distinct locations.

    ``guide_logits=None``: uniform without replacement (the reference's
    proposal).  Otherwise: weighted without replacement via Gumbel-top-k
    (an exact Plackett–Luce draw).  Correctness requires the weights to be
    STATE-INDEPENDENT (fixed data): the reverse move proposes the same
    location set with the identical probability, so the location factor
    cancels from the Hastings ratio — exactly as the uniform
    ``1/(M·(M−1)···)`` does (neither appears in the ratio).
    """
    if guide_logits is None:
        return jax.random.choice(key, M, (mmax,), replace=False)
    g = guide_logits + jax.random.gumbel(key, (M,), guide_logits.dtype)
    _, locs = jax.lax.top_k(g, mmax)
    return locs


def _uniform_nonzero_time(key, counts):
    """Samples t uniformly from {t : counts[t] > 0} via the Gumbel trick.

    Returns (t, n_nonzero).  If no nonzero entries, t is arbitrary and the
    caller must mask on n_nonzero > 0.
    """
    mask = counts > 0
    n_nonzero = jnp.sum(mask, axis=-1)
    gumbel = jax.random.gumbel(key, counts.shape, counts.dtype)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    t = jnp.argmax(logits + gumbel, axis=-1)
    return t, n_nonzero


def _static_uniform(decay):
    """True iff ``decay`` is the static Python value 1.0 — the exactly-
    uniform proposal fast path.  Traced decays (Robbins–Monro acceptance
    autotuning passes them through the jit boundary so retuning never
    recompiles) always take the geometric branch, clipped strictly inside
    (0, 1) where every formula below is well-defined."""
    return isinstance(decay, (float, int)) and decay == 1.0


def _as_decay(decay):
    """Clips a traced decay into (0, 1); static floats pass through."""
    if isinstance(decay, (float, int)):
        return decay
    return jnp.clip(decay, 1e-3, 1.0 - 1e-6)


def _sample_two_sided_geometric(key, left, right, decay):
    """Samples d from P(d) ~ decay^(|d|-1) on {-left..-1} u {1..right}.

    Returns (d, log_mass) where log_mass = log sum decay^(j-1) over the
    support — the only piece of the pmf that does NOT cancel in the
    forward/reverse Hastings ratio (decay^(|d|-1) is shared).
    ``decay == 1.0`` (static) degenerates to the uniform proposal; a traced
    decay takes the geometric branch (see :func:`_static_uniform`).
    """
    k_side, k_j = jax.random.split(key)
    left_f = left.astype(jnp.float32)
    right_f = right.astype(jnp.float32)
    if _static_uniform(decay):
        mass_l, mass_r = left_f, right_f
    else:
        decay = _as_decay(decay)
        mass_l = 1.0 - decay**left_f
        mass_r = 1.0 - decay**right_f
    total = jnp.maximum(mass_l + mass_r, 1e-30)
    go_right = jax.random.uniform(k_side, left.shape) < mass_r / total
    side_len = jnp.where(go_right, right_f, left_f)
    u = jax.random.uniform(k_j, left.shape)
    if _static_uniform(decay):
        j = jnp.floor(u * jnp.maximum(side_len, 1.0)) + 1.0
    else:
        side_mass = 1.0 - decay**side_len
        j = jnp.ceil(
            jnp.log(jnp.maximum(1.0 - u * side_mass, 1e-30))
            / jnp.log(decay)
        )
    j = jnp.clip(j, 1.0, jnp.maximum(side_len, 1.0)).astype(left.dtype)
    d = jnp.where(go_right, j, -j)
    return d, jnp.log(total)


def _sample_truncated_geometric(key, cap, decay):
    """Samples x from P(x) ~ decay^(x-1) on {1..cap} (cap float array).

    Returns (x, log_mass) with log_mass = log sum decay^(x-1) over the
    support (the non-cancelling Hastings piece).  decay==1.0 -> uniform.
    """
    cap_f = jnp.maximum(cap, 1.0)
    u = jax.random.uniform(key, jnp.shape(cap))
    if _static_uniform(decay):
        x = jnp.floor(u * cap_f) + 1.0
        log_mass = jnp.log(cap_f)
    else:
        decay = _as_decay(decay)
        mass = 1.0 - decay**cap_f
        x = jnp.ceil(
            jnp.log(jnp.maximum(1.0 - u * mass, 1e-30)) / jnp.log(decay)
        )
        log_mass = jnp.log(jnp.maximum(mass, 1e-30))
    return jnp.clip(x, 1.0, cap_f), log_mass


def _log_mass_geometric(cap, decay):
    """log sum decay^(x-1) over {1..cap} (the reverse-side normalizer)."""
    cap_f = jnp.maximum(cap, 1.0)
    if _static_uniform(decay):
        return jnp.log(cap_f)
    decay = _as_decay(decay)
    return jnp.log(jnp.maximum(1.0 - decay**cap_f, 1e-30))


class _MoveProposal(NamedTuple):
    """Internals of one multi-location event-move proposal, shared by the
    plain and the gamma0-compensated move kernels.  The proposal is NOT
    applied: the delta and Hastings ratio are both computed from the
    pre-move tensors (reverse-side counts from local [mmax, T] row
    updates), so the caller scatters into the big tensors exactly once —
    after the accept decision, with the rejected-x masked to zero."""

    delta_lp: jnp.ndarray  # likelihood delta at fixed parameters
    hastings: jnp.ndarray  # log q(reverse)/q(forward)
    locs: jnp.ndarray  # [mmax]
    t_src: jnp.ndarray  # [mmax]
    t_dst: jnp.ndarray  # [mmax] clipped destination times
    d: jnp.ndarray  # [mmax] displacements
    x_eff: jnp.ndarray  # [mmax] events moved (0 for null locations)


def _propose_moves(
    key,
    events,
    state,
    evaluator,
    target_id: int,
    dmax: int,
    mmax: int,
    nmax: int,
    move_decay: float,
    x_decay: float,
    commute=None,
    guide_logits=None,
):
    """Samples and applies a multi-location move proposal.

    Proposal, per chosen location (locations uniform without replacement,
    or — when ``guide_logits`` is given — weighted without replacement by
    fixed state-independent logits; see :func:`_sample_locations` for the
    Hastings-cancellation argument):
      t_src  ~ Uniform{t : events[loc, t, target] > 0}   (null if none)
      d      ~ truncated two-sided geometric with decay ``move_decay`` on
               {-min(dmax,t_src)..-1} u {1..min(dmax, T-1-t_src)} —
               sampled *within* the valid range (with dmax > T an
               unconstrained proposal auto-rejects ~90% of the time), and
               favoring small displacements (raises acceptance toward the
               reference's ~23% manual-tuning target,
               doc/lancs_space_model_concept.tex:325-326).
               ``move_decay=1.0`` recovers the uniform proposal.
      x      ~ truncated geometric with decay ``x_decay`` on
               {1 .. min(nmax, events[loc, t_src, target])}
               (``x_decay=1.0`` is uniform)
      move x events from t_src to t_src + d.

    Hastings ratio: product over locations of
      [1/n_nonzero' * 1/min(nmax, count'_dst) * Z_fwd] /
      [1/n_nonzero  * 1/min(nmax, count_src)  * Z_rev]
    with Z_* the displacement-pmf normalizers at the source/destination
    times (the decay^(|d|-1) factor is shared and cancels).
    """
    M, T, X = events.shape
    dtype = events.dtype
    k_loc, k_t, k_d, k_x = jax.random.split(key, 4)

    locs = _sample_locations(k_loc, M, mmax, guide_logits)
    counts = events[locs, :, target_id]  # [mmax, T]
    t_src, n_nonzero = _uniform_nonzero_time(k_t, counts)  # [mmax]
    has_events = n_nonzero > 0

    left = jnp.minimum(dmax, t_src)  # [mmax]
    right = jnp.minimum(dmax, T - 1 - t_src)
    d, log_mass_fwd = _sample_two_sided_geometric(
        k_d, left, right, move_decay
    )

    count_src = counts[jnp.arange(mmax), t_src]
    cap_fwd = jnp.minimum(jnp.asarray(nmax, dtype), count_src)
    x, log_mass_x_fwd = _sample_truncated_geometric(k_x, cap_fwd, x_decay)
    x = x.astype(dtype)

    t_dst = t_src + d  # always within [0, T)
    active = has_events & (left + right > 0)
    x_eff = jnp.where(active, x, 0.0)
    t_dst_safe = jnp.clip(t_dst, 0, T - 1)
    left_r = jnp.minimum(dmax, t_dst_safe)
    right_r = jnp.minimum(dmax, T - 1 - t_dst_safe)
    if _static_uniform(move_decay):
        mass_rev = (left_r + right_r).astype(jnp.float32)
    else:
        move_decay_ = _as_decay(move_decay)
        mass_rev = (
            1.0 - move_decay_ ** left_r.astype(jnp.float32)
        ) + (1.0 - move_decay_ ** right_r.astype(jnp.float32))
    log_mass_rev = jnp.log(jnp.maximum(mass_rev, 1e-30))

    # Joint evaluation: all mmax locations' deltas in ONE eval (rows are
    # disjoint; E->I moves couple rows through the infection rate, which
    # the evaluator handles jointly) — instead of mmax serial eval+apply
    # rounds, which made the event sweep launch-bound at UK scale.
    # Everything is computed from the PRE-move tensors: the reverse-side
    # counts come from local row updates of the already-gathered
    # [mmax, T] counts (distinct rows, so the update is exact), not from
    # scattering into the big tensors — the caller applies once, after
    # the accept decision.
    delta_total = evaluator.joint_move_delta(
        events, state, locs, t_src, t_dst_safe, x_eff, target_id,
        commute=commute,
    )

    # Hastings correction (only for active locations; null moves cancel).
    ts = jnp.arange(T)
    counts_new = counts + x_eff[:, None] * (
        (ts[None, :] == t_dst_safe[:, None]).astype(dtype)
        - (ts[None, :] == t_src[:, None]).astype(dtype)
    )
    n_nonzero_new = jnp.sum(counts_new > 0, axis=-1)
    count_dst_new = counts_new[jnp.arange(mmax), t_dst_safe]
    cap_rev = jnp.minimum(jnp.asarray(nmax, dtype), count_dst_new)
    log_q_fwd = (
        -jnp.log(jnp.maximum(n_nonzero, 1))
        - log_mass_x_fwd.astype(dtype)
        - log_mass_fwd.astype(dtype)
    )
    log_q_rev = (
        -jnp.log(jnp.maximum(n_nonzero_new, 1))
        - _log_mass_geometric(cap_rev, x_decay).astype(dtype)
        - log_mass_rev.astype(dtype)
    )
    hastings = jnp.sum(jnp.where(active, log_q_rev - log_q_fwd, 0.0))
    return _MoveProposal(
        delta_lp=delta_total,
        hastings=hastings,
        locs=locs,
        t_src=t_src,
        t_dst=t_dst_safe,
        d=d,
        x_eff=x_eff,
    )


def _apply_moves(prop: _MoveProposal, x, events, state, commute, target_id,
                 evaluator):
    """Applies the proposal's moves with event count ``x`` per location
    (callers pass ``x_eff`` masked to zero on rejection — ONE scatter
    round per MH step; a full-tensor ``where(accepted, new, old)`` would
    copy the [M,T,X] events and [M,T,S] state every proposal, the
    dominant HBM traffic at scale).  A threaded commute updates the same
    way (its update is linear in x)."""
    ev, st = apply_event_deltas(
        events, state, prop.locs, prop.t_src, prop.t_dst, x, target_id
    )
    for i in range(prop.locs.shape[0]):
        commute = evaluator.apply_commute(
            commute, prop.locs[i], prop.t_src[i], prop.t_dst[i], x[i],
            target_id,
        )
    return ev, st, commute


def event_move_step(
    key,
    events,
    state,
    current_logp,
    evaluator,
    target_id: int,
    dmax: int,
    mmax: int,
    nmax: int,
    move_decay: float = 0.9,
    x_decay: float = 1.0,
    commute=None,
    guide_logits=None,
):
    """Moves up to ``nmax`` events of one transition in time, at ``mmax``
    locations jointly (one MH accept/reject).

    Proposal and Hastings ratio: see :func:`_propose_moves`;
    ``guide_logits`` (fixed, state-independent) reweights the location
    draw with no Hastings change (:func:`_sample_locations`).

    Returns:
      (events, state, logp, EventMoveInfo) — or, when a threaded
      ``commute`` is passed (the production fast path, see likelihood.py),
      (events, state, commute, logp, EventMoveInfo).
    """
    dtype = events.dtype
    k_prop, k_acc = jax.random.split(key)
    prop = _propose_moves(
        k_prop, events, state, evaluator, target_id, dmax, mmax, nmax,
        move_decay, x_decay, commute=commute, guide_logits=guide_logits,
    )
    log_alpha = prop.delta_lp + prop.hastings

    u = jax.random.uniform(k_acc, (), dtype)
    accepted = jnp.log(u) < log_alpha
    x_apply = jnp.where(accepted, prop.x_eff, 0.0)
    ev_cur, st_cur, commute = _apply_moves(
        prop, x_apply, events, state, commute, target_id, evaluator
    )
    logp_out = current_logp + jnp.where(accepted, prop.delta_lp, 0.0)
    info = EventMoveInfo(
        is_accepted=accepted,
        target_log_prob=logp_out,
        m=prop.locs.astype(dtype),
        t=prop.t_src.astype(dtype),
        delta_t=prop.d.astype(dtype),
        x_star=prop.x_eff,
    )
    if commute is None:
        return ev_cur, st_cur, logp_out, info
    return ev_cur, st_cur, commute, logp_out, info


def compensated_move_step(
    key,
    events,
    state,
    current_logp,
    evaluator,
    gamma,
    potential_fn,
    gamma_delta_fn,
    target_id: int,
    dmax: int,
    mmax: int,
    nmax: int,
    move_decay: float = 0.9,
    x_decay: float = 1.0,
    commute=None,
    guide_logits=None,
):
    """Joint (gamma0, events) move: an event move plus a *deterministic*
    compensating translation of a rate intercept.

    Motivation: with the removals observed, gamma0 ~ log(removals /
    infectious-person-time) sits on a tight likelihood ridge with the
    latent E->I event times — an event move that changes person-time PT is
    penalized by the I->R binomial at fixed gamma0, and a gamma0 change is
    penalized at fixed events, so the two-block Gibbs chain random-walks
    *across* the ridge (measured: corr(gamma0, log PT) ~ -0.45, PT lag-1
    autocorrelation 0.98).  This kernel moves *along* it.

    Proposal: sample an event move exactly as :func:`event_move_step`
    (same Hastings machinery), then set

        gamma' = gamma + potential(state) - potential(state')

    (production: ``potential = log sum I`` so ``exp(gamma') * PT' =
    exp(gamma) * PT``, preserving the expected number of removals).  For a
    fixed event move the gamma update is a translation, so |Jacobian| = 1
    and reversibility follows from the potential-difference form (the
    reverse move's shift is exactly ``-shift``).

    Note the kernel conserves ``gamma + potential(state)``: it is not
    ergodic on its own and must be composed with a kernel that moves gamma
    across the ridge (the HMC block does).

    Args:
      gamma: current scalar (e.g. gamma0, unconstrained = natural here).
      potential_fn: ``state [M,T,S] -> scalar`` ridge potential.
      gamma_delta_fn: ``(events', state', gamma, gamma') -> delta logp`` of
        all gamma-dependent density terms evaluated at the *proposed*
        events — i.e. ``logp(gamma', e') - logp(gamma, e')`` (production:
        the I->R rate-only likelihood delta + the gamma0 prior delta).
      Other args: as :func:`event_move_step`.

    Returns:
      (events, state, logp, gamma, EventMoveInfo) — with a threaded
      ``commute``: (events, state, commute, logp, gamma, EventMoveInfo).
    """
    dtype = events.dtype
    k_prop, k_acc = jax.random.split(key)
    phi_old = potential_fn(state)
    prop = _propose_moves(
        k_prop, events, state, evaluator, target_id, dmax, mmax, nmax,
        move_decay, x_decay, commute=commute, guide_logits=guide_logits,
    )
    # This kernel needs the PROPOSED tensors before the accept decision
    # (potential_fn/gamma_delta_fn evaluate at the proposed state), so it
    # keeps the apply-then-revert shape the plain kernels dropped.
    ev_new, st_new = apply_event_deltas(
        events, state, prop.locs, prop.t_src, prop.t_dst, prop.x_eff,
        target_id,
    )
    cm_new = commute
    for i in range(mmax):
        cm_new = evaluator.apply_commute(
            cm_new, prop.locs[i], prop.t_src[i], prop.t_dst[i],
            prop.x_eff[i], target_id,
        )
    phi_new = potential_fn(st_new)
    gamma_new = gamma + phi_old - phi_new
    delta_gamma = gamma_delta_fn(ev_new, st_new, gamma, gamma_new)
    delta_total = prop.delta_lp + delta_gamma
    log_alpha = delta_total + prop.hastings

    u = jax.random.uniform(k_acc, (), dtype)
    accepted = jnp.log(u) < log_alpha
    x_revert = jnp.where(accepted, 0.0, prop.x_eff)
    ev_cur, st_cur = apply_event_deltas(
        ev_new, st_new, prop.locs, prop.t_dst, prop.t_src, x_revert,
        target_id,
    )
    commute = cm_new
    for i in range(mmax):
        commute = evaluator.apply_commute(
            commute, prop.locs[i], prop.t_dst[i], prop.t_src[i],
            x_revert[i], target_id,
        )
    gamma_out = jnp.where(accepted, gamma_new, gamma)
    logp_out = current_logp + jnp.where(accepted, delta_total, 0.0)
    info = EventMoveInfo(
        is_accepted=accepted,
        target_log_prob=logp_out,
        m=prop.locs.astype(dtype),
        t=prop.t_src.astype(dtype),
        delta_t=prop.d.astype(dtype),
        x_star=prop.x_eff,
    )
    if commute is None:
        return ev_cur, st_cur, logp_out, gamma_out, info
    return ev_cur, st_cur, commute, logp_out, gamma_out, info


class _PairProposal(NamedTuple):
    """Internals of one episode-translation proposal, shared by the plain
    and the gamma0-compensated pair kernels."""

    events: jnp.ndarray  # proposed tensors (both moves applied)
    state: jnp.ndarray
    delta_lp: jnp.ndarray  # likelihood delta at fixed parameters
    hastings: jnp.ndarray
    locs: jnp.ndarray  # [mmax]
    t1: jnp.ndarray  # [mmax] S->E source times
    t2: jnp.ndarray  # [mmax] E->I source times
    t1_dst: jnp.ndarray
    t2_dst: jnp.ndarray
    d: jnp.ndarray  # [mmax] displacements
    x_eff: jnp.ndarray  # [mmax]
    commute: jnp.ndarray = None


def _propose_pairs(
    key,
    events,
    state,
    evaluator,
    dmax: int,
    mmax: int,
    nmax: int,
    move_decay: float,
    x_decay: float,
    commute=None,
    guide_logits=None,
):
    """Samples and applies an episode-translation proposal (see
    :func:`pair_move_step` for the proposal and Hastings derivation)."""
    M, T, X = events.shape
    dtype = events.dtype
    k_loc, k_t2, k_t1, k_d, k_x = jax.random.split(key, 5)

    locs = _sample_locations(k_loc, M, mmax, guide_logits)
    counts_ei = events[locs, :, 1]  # [mmax, T]
    counts_se = events[locs, :, 0]  # [mmax, T]
    t2, n2 = _uniform_nonzero_time(k_t2, counts_ei)  # [mmax]
    ts = jnp.arange(T)
    se_before = counts_se * (ts[None, :] <= t2[:, None])
    t1, n1 = _uniform_nonzero_time(k_t1, se_before)
    has_pair = (n2 > 0) & (n1 > 0)

    left = jnp.minimum(dmax, t1)
    right = jnp.minimum(dmax, T - 1 - t2)
    d, log_mass_d_fwd = _sample_two_sided_geometric(
        k_d, left, right, move_decay
    )

    cnt1 = counts_se[jnp.arange(mmax), t1]
    cnt2 = counts_ei[jnp.arange(mmax), t2]
    cap_fwd = jnp.minimum(jnp.asarray(nmax, dtype), jnp.minimum(cnt1, cnt2))
    x, log_mass_x_fwd = _sample_truncated_geometric(k_x, cap_fwd, x_decay)
    x = x.astype(dtype)

    active = has_pair & (left + right > 0)
    x_eff = jnp.where(active, x, 0.0)
    t1_dst = jnp.clip(t1 + d, 0, T - 1)
    t2_dst = jnp.clip(t2 + d, 0, T - 1)

    # Apply per-location pair moves sequentially; deltas telescope (each
    # single-transition move is evaluated from the pre-move tensors).
    ev_cur, st_cur, cm_cur = events, state, commute
    delta_total = jnp.zeros((), dtype)
    for i in range(mmax):
        for k_id, t_from, t_to in (
            (0, t1[i], t1_dst[i]),
            (1, t2[i], t2_dst[i]),
        ):
            delta_i = evaluator.move_delta(
                ev_cur, st_cur, locs[i], t_from, t_to, x_eff[i], k_id,
                commute=cm_cur,
            )
            ev_cur, st_cur = apply_event_delta(
                ev_cur, st_cur, locs[i], t_from, t_to, x_eff[i], k_id
            )
            cm_cur = evaluator.apply_commute(
                cm_cur, locs[i], t_from, t_to, x_eff[i], k_id
            )
            delta_total = delta_total + delta_i

    # Hastings: reverse picks t2+d from nonzero E->I times, then t1+d from
    # nonzero S->E times <= t2+d, displacement -d (same |d| pmf factor,
    # different normalizers), x from the new count caps.
    counts_ei_new = ev_cur[locs, :, 1]
    counts_se_new = ev_cur[locs, :, 0]
    n2_new = jnp.sum(counts_ei_new > 0, axis=-1)
    n1_new = jnp.sum(
        (counts_se_new > 0) & (ts[None, :] <= t2_dst[:, None]), axis=-1
    )
    left_r = jnp.minimum(dmax, t1_dst)
    right_r = jnp.minimum(dmax, T - 1 - t2_dst)
    if _static_uniform(move_decay):
        mass_rev = (left_r + right_r).astype(jnp.float32)
    else:
        move_decay_ = _as_decay(move_decay)
        mass_rev = (
            1.0 - move_decay_ ** left_r.astype(jnp.float32)
        ) + (1.0 - move_decay_ ** right_r.astype(jnp.float32))
    log_mass_d_rev = jnp.log(jnp.maximum(mass_rev, 1e-30))
    cnt1_new = counts_se_new[jnp.arange(mmax), t1_dst]
    cnt2_new = counts_ei_new[jnp.arange(mmax), t2_dst]
    cap_rev = jnp.minimum(
        jnp.asarray(nmax, dtype), jnp.minimum(cnt1_new, cnt2_new)
    )
    log_q_fwd = (
        -jnp.log(jnp.maximum(n2, 1))
        - jnp.log(jnp.maximum(n1, 1))
        - log_mass_x_fwd.astype(dtype)
        - log_mass_d_fwd.astype(dtype)
    )
    log_q_rev = (
        -jnp.log(jnp.maximum(n2_new, 1))
        - jnp.log(jnp.maximum(n1_new, 1))
        - _log_mass_geometric(cap_rev, x_decay).astype(dtype)
        - log_mass_d_rev.astype(dtype)
    )
    hastings = jnp.sum(jnp.where(active, log_q_rev - log_q_fwd, 0.0))
    return _PairProposal(
        events=ev_cur, state=st_cur, delta_lp=delta_total,
        hastings=hastings, locs=locs, t1=t1, t2=t2, t1_dst=t1_dst,
        t2_dst=t2_dst, d=d, x_eff=x_eff, commute=cm_cur,
    )


def _revert_pairs(prop: _PairProposal, accepted, evaluator):
    """Applies the inverse pair moves when rejected (see
    :func:`_revert_if_rejected`)."""
    x_revert = jnp.where(accepted, 0.0, prop.x_eff)
    ev_cur, st_cur, cm_cur = prop.events, prop.state, prop.commute
    for i in range(prop.locs.shape[0]):
        for k_id, t_from, t_to in (
            (0, prop.t1_dst[i], prop.t1[i]),
            (1, prop.t2_dst[i], prop.t2[i]),
        ):
            ev_cur, st_cur = apply_event_delta(
                ev_cur, st_cur, prop.locs[i], t_from, t_to, x_revert[i],
                k_id,
            )
            cm_cur = evaluator.apply_commute(
                cm_cur, prop.locs[i], t_from, t_to, x_revert[i], k_id
            )
    return ev_cur, st_cur, cm_cur


def pair_move_step(
    key,
    events,
    state,
    current_logp,
    evaluator,
    dmax: int,
    mmax: int,
    nmax: int,
    move_decay: float = 0.9,
    x_decay: float = 1.0,
    commute=None,
    guide_logits=None,
):
    """Translates infection *episodes*: moves x S->E events at t1 AND x
    E->I events at t2 (same location) by the same displacement d, jointly.

    Motivation: the min-scalar ESS bottleneck is the infectious person-time
    PT = sum I (gamma0 tracks -log PT), and PT only changes when E->I times
    move.  Measured penalty decomposition of single E->I moves at NI scale:
    the E->I (NU-sojourn) binomial term dominates (-0.8..-2.2 median
    log-lik for |d| = 1..8) because moving an E->I event breaks the E
    occupancy implied by its upstream S->E event.  Moving the *pair*
    preserves the sojourn structure (the E window [t1, t2) translates), so
    the same |d| costs a median -0.9..+1.6 — large PT steps become
    acceptable.

    Proposal, per chosen location (uniform without replacement):
      t2 ~ Uniform{t : events[loc, t, 1] > 0}          (null if none)
      t1 ~ Uniform{t <= t2 : events[loc, t, 0] > 0}    (null if none)
      d  ~ truncated two-sided geometric on
           {-min(dmax, t1) .. -1} u {1 .. min(dmax, T-1-t2)}
           (t1 <= t2 makes t1 left-binding and t2 right-binding; both
           shifted times stay in [0, T))
      x  ~ truncated geometric on
           {1 .. min(nmax, events[loc,t1,0], events[loc,t2,1])}
      move x S->E events t1 -> t1+d and x E->I events t2 -> t2+d.

    Reversibility: the reverse proposal picks t2+d, then t1+d (ordering
    preserved: both shift by d), displacement -d; the Hastings ratio is the
    product of the nonzero-count, displacement-mass and count-cap
    normalizer ratios, exactly as the single-move kernel.

    Note the kernel conserves ``sum_t t*(events[:,t,1] - events[:,t,0])``
    per location: it is not ergodic alone and composes with the plain
    per-transition move kernels.

    Returns:
      (events, state, logp, EventMoveInfo) — ``delta_t`` traces d and
      ``t`` traces t2 (the E->I source time).  With a threaded
      ``commute``: (events, state, commute, logp, EventMoveInfo).
    """
    dtype = events.dtype
    k_prop, k_acc = jax.random.split(key)
    prop = _propose_pairs(
        k_prop, events, state, evaluator, dmax, mmax, nmax, move_decay,
        x_decay, commute=commute, guide_logits=guide_logits,
    )
    log_alpha = prop.delta_lp + prop.hastings

    u = jax.random.uniform(k_acc, (), dtype)
    accepted = jnp.log(u) < log_alpha
    ev_cur, st_cur, cm_cur = _revert_pairs(prop, accepted, evaluator)
    logp_out = current_logp + jnp.where(accepted, prop.delta_lp, 0.0)
    info = EventMoveInfo(
        is_accepted=accepted,
        target_log_prob=logp_out,
        m=prop.locs.astype(dtype),
        t=prop.t2.astype(dtype),
        delta_t=prop.d.astype(dtype),
        x_star=prop.x_eff,
    )
    if cm_cur is None:
        return ev_cur, st_cur, logp_out, info
    return ev_cur, st_cur, cm_cur, logp_out, info


def compensated_pair_move_step(
    key,
    events,
    state,
    current_logp,
    evaluator,
    gamma,
    potential_fn,
    gamma_delta_fn,
    dmax: int,
    mmax: int,
    nmax: int,
    move_decay: float = 0.9,
    x_decay: float = 1.0,
    commute=None,
    guide_logits=None,
):
    """Episode translation with a *deterministic* gamma0 ridge
    compensation — the composition of :func:`pair_move_step` and
    :func:`compensated_move_step`'s translation.

    Motivation: the two penalties that block large E->I displacements are
    (a) the E-sojourn binomial — removed by moving the upstream S->E event
    along (the pair move), and (b) the I->R binomial at fixed gamma0 — an
    E->I event moving by d changes infectious person-time by -x*d (the
    removal times are observation-pinned), which at fixed gamma0 costs
    ~|x*d| * rate in expectation.  Setting

        gamma' = gamma + potential(state) - potential(state')

    with ``potential = log sum I`` keeps exp(gamma)*PT — the expected
    removal count — invariant, cancelling penalty (b) to first order.
    Together the pair proposal strides the (gamma0, person-time) ridge in
    one joint move.  Reversibility follows exactly as in
    :func:`compensated_move_step`: for a fixed event move the gamma update
    is a translation (|Jacobian| = 1) and the reverse move's shift is
    ``-shift``; the event-side Hastings machinery is the pair kernel's.
    The kernel conserves ``gamma + potential(state)`` and composes with
    HMC for ergodicity.

    Args: as :func:`pair_move_step` plus ``gamma`` / ``potential_fn`` /
    ``gamma_delta_fn`` as in :func:`compensated_move_step`.

    Returns:
      (events, state, logp, gamma, EventMoveInfo) — with a threaded
      ``commute``: (events, state, commute, logp, gamma, EventMoveInfo).
    """
    dtype = events.dtype
    k_prop, k_acc = jax.random.split(key)
    phi_old = potential_fn(state)
    prop = _propose_pairs(
        k_prop, events, state, evaluator, dmax, mmax, nmax, move_decay,
        x_decay, commute=commute, guide_logits=guide_logits,
    )
    phi_new = potential_fn(prop.state)
    gamma_new = gamma + phi_old - phi_new
    delta_gamma = gamma_delta_fn(prop.events, prop.state, gamma, gamma_new)
    delta_total = prop.delta_lp + delta_gamma
    log_alpha = delta_total + prop.hastings

    u = jax.random.uniform(k_acc, (), dtype)
    accepted = jnp.log(u) < log_alpha
    ev_cur, st_cur, cm_cur = _revert_pairs(prop, accepted, evaluator)
    gamma_out = jnp.where(accepted, gamma_new, gamma)
    logp_out = current_logp + jnp.where(accepted, delta_total, 0.0)
    info = EventMoveInfo(
        is_accepted=accepted,
        target_log_prob=logp_out,
        m=prop.locs.astype(dtype),
        t=prop.t2.astype(dtype),
        delta_t=prop.d.astype(dtype),
        x_star=prop.x_eff,
    )
    if cm_cur is None:
        return ev_cur, st_cur, logp_out, gamma_out, info
    return ev_cur, st_cur, cm_cur, logp_out, gamma_out, info


def occult_step(
    key,
    events,
    state,
    current_logp,
    evaluator,
    target_id: int,
    t_range,
    nmax: int,
    x_decay: float = 1.0,
    guide_logits=None,
    commute=None,
):
    """Adds or deletes unobserved ("occult") events of one transition.

    Proposal: location ~ Uniform(M); t ~ Uniform[t_range); add/delete with
    probability 1/2 each;
      add:    x ~ TruncGeom(x_decay){1..nmax}
      delete: x ~ TruncGeom(x_decay){1..min(nmax, events[loc, t, target])}
              (null if 0); x_decay=1.0 (default) is uniform.
    Reference contract: ``UncalibratedOccultUpdate`` with
    ``t_range=[T-21, T)``, ``nmax=occult_nmax``
    (mcmc_kernel_factory.py:89-113, inference.py:334-341).

    ``guide_logits`` (optional, ``[M]``) replaces the uniform location
    draw with ``loc ~ Categorical(guide_logits)`` — a *guided* proposal
    concentrating occult mass where it can actually be absorbed (the
    uniform draw collapses to ~0 acceptance at UK scale, where <20% of
    locations hold 90% of the window's events).  Correctness requires the
    weights to be STATE-INDEPENDENT (fixed data, e.g. observed I->R
    cases — which no kernel modifies): then the forward add at ``loc``
    and its reverse delete at the SAME ``loc`` carry the identical
    ``q(loc)`` factor, which cancels from the Hastings ratio exactly as
    the uniform ``1/M`` does.  No other term changes.  Weights must be
    strictly positive everywhere (mix with a uniform floor) so every
    cell stays proposable in both directions.

    Returns:
      (events, state, logp, EventMoveInfo) — with a threaded ``commute``:
      (events, state, commute, logp, EventMoveInfo).
    """
    M, T, X = events.shape
    dtype = events.dtype
    t_lo, t_hi = t_range
    k_loc, k_t, k_dir, k_x, k_acc = jax.random.split(key, 5)

    if guide_logits is None:
        loc = jax.random.randint(k_loc, (), 0, M)
    else:
        loc = jax.random.categorical(k_loc, guide_logits)
    t = jax.random.randint(k_t, (), t_lo, t_hi)
    is_add = jax.random.bernoulli(k_dir, 0.5)

    count = events[loc, t, target_id]
    cap_del = jnp.minimum(jnp.asarray(nmax, dtype), count)
    x_add, _ = _sample_truncated_geometric(
        k_x, jnp.asarray(float(nmax)), x_decay
    )
    x_add = x_add.astype(dtype)
    x_del, _ = _sample_truncated_geometric(k_x, cap_del, x_decay)
    x_del = x_del.astype(dtype)
    can_delete = count > 0
    x = jnp.where(is_add, x_add, jnp.where(can_delete, x_del, 0.0))
    delta_x = jnp.where(is_add, x, -x)

    delta_lp = evaluator.occult_delta(
        events, state, loc, t, delta_x, target_id, commute=commute
    )

    # Hastings: forward-add has q_x = 1/nmax, reverse-delete has
    # q_x = 1/min(nmax, count + x); vice versa for forward-delete.
    # Location/time/direction factors cancel.
    nmax_f = jnp.asarray(float(nmax))
    log_h_add = _log_mass_geometric(nmax_f, x_decay) - _log_mass_geometric(
        jnp.minimum(nmax_f, count + x_add), x_decay
    )
    log_h_del = _log_mass_geometric(cap_del, x_decay) - _log_mass_geometric(
        nmax_f, x_decay
    )
    hastings = jnp.where(is_add, log_h_add, log_h_del)

    # A delete drawn on an empty cell is a *null* proposal: nothing changes
    # and it must NOT count as accepted (gemlib semantics — otherwise the
    # printed acceptance rates are inflated against the ~23% target,
    # doc/lancs_space_model_concept.tex:325-326).  The chain transition is
    # identical either way (x = 0 applies the identity).
    is_null = ~is_add & ~can_delete
    log_alpha = delta_lp + hastings
    u = jax.random.uniform(k_acc, (), dtype)
    accepted = ~is_null & (jnp.log(u) < log_alpha)
    # Single-apply: the delta and Hastings ratio are computed from the
    # pre-update tensors, so the one scatter happens after the accept
    # decision with the rejected-x masked to zero (no revert round).
    x_apply = jnp.where(accepted, delta_x, 0.0)
    events_out, state_out = apply_event_delta(
        events, state, loc, t, t, x_apply, target_id, occult=True
    )
    commute = evaluator.apply_commute(
        commute, loc, t, t, x_apply, target_id, occult=True
    )
    logp_out = current_logp + jnp.where(accepted, delta_lp, 0.0)
    info = EventMoveInfo(
        is_accepted=accepted,
        target_log_prob=logp_out,
        m=loc.astype(dtype),
        t=t.astype(dtype),
        delta_t=jnp.where(is_add, 1.0, -1.0).astype(dtype),
        x_star=jnp.abs(delta_x),
    )
    if commute is None:
        return events_out, state_out, logp_out, info
    return events_out, state_out, commute, logp_out, info
