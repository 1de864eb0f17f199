"""Likelihood evaluators for the event-tensor MH kernels.

Two interchangeable implementations of the same contract:

* :class:`FullEvaluator` — re-evaluates a caller-supplied density on the
  whole event tensor per proposal.  Generic (used by the exact-stationarity
  unit tests on enumerable toy targets) but O(M*T) per proposal.

* :class:`WindowedEvaluator` — model-specific incremental evaluation.  An
  event move/occult touches the state only inside a bounded time window, so
  only the log-pmf cells whose (n, k, rate) actually changed are recomputed:

    - S->E kernels change S and E but not I, so no *rate* changes at all:
      the delta involves only the chosen location's rows over the window —
      O(dmax) cells instead of O(M*T).
    - E->I kernels change I, which perturbs the S->E rate at *all* locations
      in the window.  For those cells n and k are unchanged, so the lgamma
      terms cancel analytically:
          dlp = k*[log(-expm1(-r')) - log(-expm1(-r))] - (n-k)*(r'-r)
      — no lgammas, ~4 transcendentals/cell, and the commuting matvec
      update is rank-1 (only one location's I changed).

  Measured on TPU this takes the 20-eval event sweep from ~10 ms to ~1 ms
  per 16-chain step at full-UK scale.

Evaluators consume a ``state`` tensor [M, T, S] threaded alongside the
events and kept incrementally consistent via :func:`apply_event_delta`.
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import CovidUK, Parameters, RATE_EPS, _alpha_timeseries
from covid19uk_tpu.ops.binomial import binomial_log_pmf_from_rate

# stoichiometry rows as Python constants: transition k changes state by
# STOICHIOMETRY[k] (seir.STOICHIOMETRY; model_spec.py:24)
_STOICH = seir.STOICHIOMETRY


def apply_event_delta(events, state, loc, t_from, t_to, x, k, occult=False):
    """Applies an event perturbation to (events, state) consistently.

    Move (``occult=False``): x events of transition k at ``loc`` relocate
    from ``t_from`` to ``t_to``; the implied state changes by
    ``x * S_k * ([t > t_to] - [t > t_from])`` (i.e. on the open-closed
    window between the two times).

    Occult (``occult=True``): ``x`` is *signed*; events[loc, t_to, k] += x
    and state shifts by ``x * S_k`` for all t > t_to (``t_from`` ignored).

    ``k`` and ``occult`` are static; indices/counts are traced.
    """
    T = events.shape[-2]
    dtype = events.dtype
    stoich_k = jnp.asarray(_STOICH[k], dtype)

    ev = events.at[loc, t_to, k].add(x)
    ts = jnp.arange(T)
    if occult:
        w = (ts > t_to).astype(dtype)
    else:
        ev = ev.at[loc, t_from, k].add(-x)
        w = (ts > t_to).astype(dtype) - (ts > t_from).astype(dtype)
    st = state.at[loc].add(x * w[:, None] * stoich_k[None, :])
    return ev, st


class LikelihoodContext(NamedTuple):
    """Per-sweep precomputed rate ingredients (fixed parameters)."""

    exp_eta: jnp.ndarray  # [M, T]
    psi_w: jnp.ndarray  # [T] = psi * w_t
    rate_ir_t: jnp.ndarray  # [T]
    nu: jnp.ndarray  # scalar
    Cstar: jnp.ndarray  # [M, M]
    N: jnp.ndarray  # [M]


def make_context(model: CovidUK, params: Parameters) -> LikelihoodContext:
    d = model.data
    T = model.num_steps
    dtype = model.initial_state.dtype
    t_abs = model.initial_step + jnp.arange(T)
    w_t = d.W[jnp.clip(t_abs, 0, d.W.shape[0] - 1)]
    weekday_t = d.weekday[jnp.clip(t_abs, 0, d.weekday.shape[0] - 1)]
    alpha = _alpha_timeseries(params.alpha_0, params.alpha_t, t_abs)
    eta = (
        alpha[None, :]
        + params.beta_area * d.log_area[:, None]
        + params.sigma_space * params.spatial_effect[:, None]
    )
    return LikelihoodContext(
        exp_eta=jnp.exp(eta),
        psi_w=params.psi * w_t,
        rate_ir_t=jnp.exp(params.gamma0 + params.gamma1 * weekday_t),
        nu=jnp.asarray(seir.NU, dtype),
        Cstar=d.Cstar,
        N=d.N,
    )


def _rate_se_rows(ctx, state, loc, idx):
    """S->E rate at one location over window time indices ``idx`` [W]."""
    I_cols = state[:, idx, 2]  # [M, W]
    commute = ctx.Cstar[loc] @ (I_cols / ctx.N[:, None])  # [W]
    return (
        ctx.exp_eta[loc, idx]
        * (state[loc, idx, 2] + ctx.psi_w[idx] * commute)
        / ctx.N[loc]
        + RATE_EPS
    )


def _rate_diff_no_lgamma(n, k, r_old, r_new):
    """Log-pmf delta when only the rate changed (n, k fixed): the lgamma
    terms cancel analytically."""
    dtype = n.dtype
    tiny = jnp.finfo(dtype).tiny
    lp_old = jnp.log(-jnp.expm1(-jnp.maximum(r_old, tiny)))
    lp_new = jnp.log(-jnp.expm1(-jnp.maximum(r_new, tiny)))
    return k * (lp_new - lp_old) - (n - k) * (r_new - r_old)


class WindowedEvaluator(NamedTuple):
    """Incremental log-likelihood deltas over bounded time windows."""

    ctx: LikelihoodContext
    window: int  # static: dmax + 1 for moves; t_range length for occults

    def move_delta(self, events, state, loc, t_from, t_to, x, k,
                   events_new, state_new):
        """Delta log-lik for moving x events of transition k, loc row,
        from t_from to t_to.  ``events_new/state_new`` already updated."""
        T = events.shape[-2]
        W = self.window
        ctx = self.ctx
        dtype = events.dtype
        t0 = jnp.minimum(t_from, t_to)
        idx_raw = t0 + jnp.arange(W)
        mask = idx_raw < T
        idx = jnp.clip(idx_raw, 0, T - 1)

        if k == 0:
            # S, E change at loc only; no rates change.
            rate_se = _rate_se_rows(ctx, state, loc, idx)  # I unchanged
            lp_old = binomial_log_pmf_from_rate(
                state[loc, idx, 0], events[loc, idx, 0], rate_se
            ) + binomial_log_pmf_from_rate(
                state[loc, idx, 1], events[loc, idx, 1], ctx.nu
            )
            lp_new = binomial_log_pmf_from_rate(
                state_new[loc, idx, 0], events_new[loc, idx, 0], rate_se
            ) + binomial_log_pmf_from_rate(
                state_new[loc, idx, 1], events_new[loc, idx, 1], ctx.nu
            )
            return jnp.sum(jnp.where(mask, lp_new - lp_old, 0.0))

        # k == 1: E, I change at loc; S->E rates change at ALL locations
        # inside (t0, t_max]; loc-row E->I and I->R terms change too.
        # (1) all-location S->E rate-only delta over the open window.
        idx1_raw = t0 + 1 + jnp.arange(W - 1)
        mask1 = idx1_raw < T
        idx1 = jnp.clip(idx1_raw, 0, T - 1)
        I_old = state[:, idx1, 2]  # [M, W-1]
        I_new = state_new[:, idx1, 2]
        commute_old = ctx.Cstar @ (I_old / ctx.N[:, None])
        # rank-1 update: only row `loc` of I changed
        dI = (I_new - I_old)[loc] / ctx.N[loc]  # [W-1]
        commute_new = commute_old + ctx.Cstar[:, loc][:, None] * dI[None, :]
        pref = ctx.exp_eta[:, idx1] / ctx.N[:, None]
        r_old = pref * (I_old + ctx.psi_w[idx1][None, :] * commute_old) + RATE_EPS
        r_new = pref * (I_new + ctx.psi_w[idx1][None, :] * commute_new) + RATE_EPS
        d0 = _rate_diff_no_lgamma(
            state[:, idx1, 0], events[:, idx1, 0], r_old, r_new
        )
        delta = jnp.sum(jnp.where(mask1[None, :], d0, 0.0))

        # (2) loc-row E->I (n_E, ev1 change) and I->R (n_I changes) terms
        # over the closed window.
        lp_old = binomial_log_pmf_from_rate(
            state[loc, idx, 1], events[loc, idx, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(
            state[loc, idx, 2], events[loc, idx, 2], ctx.rate_ir_t[idx]
        )
        lp_new = binomial_log_pmf_from_rate(
            state_new[loc, idx, 1], events_new[loc, idx, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(
            state_new[loc, idx, 2], events_new[loc, idx, 2], ctx.rate_ir_t[idx]
        )
        delta += jnp.sum(jnp.where(mask, lp_new - lp_old, 0.0))
        return delta

    def occult_delta(self, events, state, loc, t, x_signed, k,
                     events_new, state_new):
        """Delta log-lik for adding/deleting ``|x_signed|`` occult events of
        transition k at (loc, t).  State changes for all t' > t; with
        t >= T - window the affected range fits the static window."""
        T = events.shape[-2]
        W = self.window
        ctx = self.ctx
        idx_raw = t + jnp.arange(W)
        mask = idx_raw < T
        idx = jnp.clip(idx_raw, 0, T - 1)

        if k == 0:
            rate_se = _rate_se_rows(ctx, state, loc, idx)
            lp_old = binomial_log_pmf_from_rate(
                state[loc, idx, 0], events[loc, idx, 0], rate_se
            ) + binomial_log_pmf_from_rate(
                state[loc, idx, 1], events[loc, idx, 1], ctx.nu
            )
            lp_new = binomial_log_pmf_from_rate(
                state_new[loc, idx, 0], events_new[loc, idx, 0], rate_se
            ) + binomial_log_pmf_from_rate(
                state_new[loc, idx, 1], events_new[loc, idx, 1], ctx.nu
            )
            return jnp.sum(jnp.where(mask, lp_new - lp_old, 0.0))

        # k == 1: rates change at all locations for t' > t.
        idx1_raw = t + 1 + jnp.arange(W)
        mask1 = idx1_raw < T
        idx1 = jnp.clip(idx1_raw, 0, T - 1)
        I_old = state[:, idx1, 2]
        I_new = state_new[:, idx1, 2]
        commute_old = ctx.Cstar @ (I_old / ctx.N[:, None])
        dI = (I_new - I_old)[loc] / ctx.N[loc]
        commute_new = commute_old + ctx.Cstar[:, loc][:, None] * dI[None, :]
        pref = ctx.exp_eta[:, idx1] / ctx.N[:, None]
        r_old = pref * (I_old + ctx.psi_w[idx1][None, :] * commute_old) + RATE_EPS
        r_new = pref * (I_new + ctx.psi_w[idx1][None, :] * commute_new) + RATE_EPS
        d0 = _rate_diff_no_lgamma(
            state[:, idx1, 0], events[:, idx1, 0], r_old, r_new
        )
        delta = jnp.sum(jnp.where(mask1[None, :], d0, 0.0))

        lp_old = binomial_log_pmf_from_rate(
            state[loc, idx, 1], events[loc, idx, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(
            state[loc, idx, 2], events[loc, idx, 2], ctx.rate_ir_t[idx]
        )
        lp_new = binomial_log_pmf_from_rate(
            state_new[loc, idx, 1], events_new[loc, idx, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(
            state_new[loc, idx, 2], events_new[loc, idx, 2], ctx.rate_ir_t[idx]
        )
        delta += jnp.sum(jnp.where(mask, lp_new - lp_old, 0.0))
        return delta


class FullEvaluator(NamedTuple):
    """Full re-evaluation of a caller-supplied density (generic; used by
    toy-target tests and as the reference for delta-consistency tests)."""

    logp_fn: Callable  # events -> scalar

    def move_delta(self, events, state, loc, t_from, t_to, x, k,
                   events_new, state_new):
        return self.logp_fn(events_new) - self.logp_fn(events)

    def occult_delta(self, events, state, loc, t, x_signed, k,
                     events_new, state_new):
        return self.logp_fn(events_new) - self.logp_fn(events)
