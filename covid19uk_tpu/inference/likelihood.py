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


def _rate_diff_no_lgamma(n, k, r_old, r_new):
    """Log-pmf delta when only the rate changed (n, k fixed): the lgamma
    terms cancel analytically."""
    dtype = n.dtype
    tiny = jnp.finfo(dtype).tiny
    lp_old = jnp.log(-jnp.expm1(-jnp.maximum(r_old, tiny)))
    lp_new = jnp.log(-jnp.expm1(-jnp.maximum(r_new, tiny)))
    return k * (lp_new - lp_old) - (n - k) * (r_new - r_old)


class WindowedEvaluator(NamedTuple):
    """Incremental log-likelihood deltas over bounded time windows.

    Windows are *contiguous*, so all window reads are ``dynamic_slice``s
    (fast on TPU) rather than clipped gathers; the slice start is clamped
    into range, which is exact because every cell whose (n, k, rate) did
    not change contributes a bitwise-zero difference — no masks needed.
    """

    ctx: LikelihoodContext
    window: int  # static: dmax + 1 for moves; t_range length for occults

    def _delta(self, events, state, loc, s, k, events_new, state_new):
        """Shared windowed delta: slice [s, s+W) along time.

        k == 0 (S->E changed): only the loc row's transition-{0,1} terms
        differ, rates unchanged.
        k == 1 (E->I changed): S->E rates change at all locations (rate-only
        cells: lgammas cancel; rank-1 commute update) plus the loc row's
        transition-{1,2} terms.
        """
        ctx = self.ctx
        W = self.window

        def tsl(a, axis):
            return jax.lax.dynamic_slice_in_dim(a, s, W, axis=axis)

        row_old = tsl(state[loc], 0)  # [W, S]
        row_new = tsl(state_new[loc], 0)
        evrow_old = tsl(events[loc], 0)  # [W, X]
        evrow_new = tsl(events_new[loc], 0)

        if k == 0:
            # rate_se at the loc row over the window (I unchanged):
            I_cols = tsl(state[..., 2], 1)  # [M, W]
            commute = ctx.Cstar[loc] @ (I_cols / ctx.N[:, None])  # [W]
            rate_se = (
                tsl(ctx.exp_eta[loc], 0)
                * (row_old[:, 2] + tsl(ctx.psi_w, 0) * commute)
                / ctx.N[loc]
                + RATE_EPS
            )
            lp_old = binomial_log_pmf_from_rate(
                row_old[:, 0], evrow_old[:, 0], rate_se
            ) + binomial_log_pmf_from_rate(
                row_old[:, 1], evrow_old[:, 1], ctx.nu
            )
            lp_new = binomial_log_pmf_from_rate(
                row_new[:, 0], evrow_new[:, 0], rate_se
            ) + binomial_log_pmf_from_rate(
                row_new[:, 1], evrow_new[:, 1], ctx.nu
            )
            return jnp.sum(lp_new - lp_old)

        # k == 1: all-location S->E rate-only cells (S and ev0 unchanged)
        I_old = tsl(state[..., 2], 1)  # [M, W]
        I_new = tsl(state_new[..., 2], 1)
        commute_old = ctx.Cstar @ (I_old / ctx.N[:, None])
        dI = (I_new - I_old)[loc] / ctx.N[loc]  # rank-1: only loc changed
        commute_new = commute_old + ctx.Cstar[:, loc][:, None] * dI[None, :]
        pref = tsl(ctx.exp_eta, 1) / ctx.N[:, None]
        pw = tsl(ctx.psi_w, 0)[None, :]
        r_old = pref * (I_old + pw * commute_old) + RATE_EPS
        r_new = pref * (I_new + pw * commute_new) + RATE_EPS
        delta = jnp.sum(
            _rate_diff_no_lgamma(
                tsl(state[..., 0], 1), tsl(events[..., 0], 1), r_old, r_new
            )
        )
        # loc-row E->I (n_E, ev1) and I->R (n_I) terms
        rate_ir = tsl(ctx.rate_ir_t, 0)
        lp_old = binomial_log_pmf_from_rate(
            row_old[:, 1], evrow_old[:, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(row_old[:, 2], evrow_old[:, 2], rate_ir)
        lp_new = binomial_log_pmf_from_rate(
            row_new[:, 1], evrow_new[:, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(row_new[:, 2], evrow_new[:, 2], rate_ir)
        return delta + jnp.sum(lp_new - lp_old)

    def move_delta(self, events, state, loc, t_from, t_to, x, k,
                   events_new, state_new):
        """Delta log-lik for moving x events of transition k, loc row,
        from t_from to t_to.  ``events_new/state_new`` already updated."""
        T = events.shape[-2]
        s = jnp.clip(jnp.minimum(t_from, t_to), 0, T - self.window)
        return self._delta(events, state, loc, s, k, events_new, state_new)

    def occult_delta(self, events, state, loc, t, x_signed, k,
                     events_new, state_new):
        """Delta log-lik for adding/deleting ``|x_signed|`` occult events of
        transition k at (loc, t).  State changes for all t' > t; with
        t >= T - window the affected range fits the static window, so the
        slice start is simply T - window."""
        T = events.shape[-2]
        s = jnp.asarray(T - self.window)
        return self._delta(events, state, loc, s, k, events_new, state_new)


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
