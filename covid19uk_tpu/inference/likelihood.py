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

**Threaded commute (optional, the production path).**  The commuting
pressure ``commute = Cstar @ (state[..., 2] / N)`` is parameter-independent
and changes only by a rank-1 column update when an E->I event moves, yet
it was recomputed from scratch ([M,M] @ [M,window] matmul) inside every
windowed E->I delta — the dominant FLOPs of the event sweep at MSOA scale.
Callers may instead compute it once per draw (the Gibbs driver already
does, for the HMC leapfrog hoist) and thread it through the kernels via
the ``commute=`` keyword: evaluators then *slice* it, and
:meth:`WindowedEvaluator.apply_commute` keeps it consistent with the
state under accepted moves.  ``commute=None`` (default) recomputes on the
fly — bitwise the pre-threading behavior, used by unit tests and the
frozen naive baseline.
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


def apply_event_deltas(events, state, locs, t_from, t_to, xs, k):
    """Applies L moves of transition ``k`` (distinct rows) consistently.

    Deliberately a loop of single-row updates: each lowers to in-place
    dynamic-slice updates, whereas one batched multi-row ``scatter-add``
    measured ~4x slower on TPU (array-indexed scatter falls off XLA's
    in-place fast path and copies the operand)."""
    for i in range(locs.shape[0]):
        events, state = apply_event_delta(
            events, state, locs[i], t_from[i], t_to[i], xs[i], k
        )
    return events, state


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
    Cstar: jnp.ndarray  # [M, M] dense (row/column gathers)
    N: jnp.ndarray  # [M]
    # Optional block-sparse operator for the full [M,M]@[M,W] commute
    # products (the dominant matmul of the E->I windowed delta at MSOA
    # scale); the dense Cstar stays for the rank-1 row/column gathers.
    Cstar_bsr: object = None


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
        Cstar_bsr=d.Cstar_bsr,
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

    def _delta(self, events, state, loc, s, k, t_from, t_to, x, occult,
               commute=None):
        """Shared windowed delta: slice [s, s+W) along time.

        The "new" window slices are reconstructed locally from the move
        descriptor instead of reading materialized new tensors — this keeps
        the *old* full tensors dead at update time, so XLA performs the
        actual event/state updates in place (the full-tensor copies were
        the dominant HBM traffic of the sweep).

        k == 0 (S->E changed): only the loc row's transition-{0,1} terms
        differ, rates unchanged.
        k == 1 (E->I changed): S->E rates change at all locations (rate-only
        cells: lgammas cancel; rank-1 commute update) plus the loc row's
        transition-{1,2} terms.
        """
        ctx = self.ctx
        W = self.window
        dtype = events.dtype

        def tsl(a, axis):
            return jax.lax.dynamic_slice_in_dim(a, s, W, axis=axis)

        row_old = tsl(state[loc], 0)  # [W, S]
        evrow_old = tsl(events[loc], 0)  # [W, X]

        # Reconstruct the loc row's new window: event delta at the local
        # positions, state delta x*S_k on the in-window part of the
        # open-closed interval (occult: all p > t_to).
        p = s + jnp.arange(W)
        stoich_k = jnp.asarray(_STOICH[k], dtype)
        if occult:
            w_p = (p > t_to).astype(dtype)
            ev_delta = jnp.where(p == t_to, x, 0.0)
        else:
            w_p = (p > t_to).astype(dtype) - (p > t_from).astype(dtype)
            ev_delta = jnp.where(p == t_to, x, 0.0) - jnp.where(
                p == t_from, x, 0.0
            )
        row_new = row_old + x * w_p[:, None] * stoich_k[None, :]
        evrow_new = evrow_old.at[:, k].add(ev_delta)

        if k == 0:
            # rate_se at the loc row over the window (I unchanged):
            if commute is not None:
                commute_row = tsl(commute[loc], 0)  # [W]
            else:
                I_cols = tsl(state[..., 2], 1)  # [M, W]
                commute_row = ctx.Cstar[loc] @ (I_cols / ctx.N[:, None])
            rate_se = (
                tsl(ctx.exp_eta[loc], 0)
                * (row_old[:, 2] + tsl(ctx.psi_w, 0) * commute_row)
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
        dI_row = x * w_p * jnp.asarray(_STOICH[1][2], dtype)  # [W]
        I_new = I_old.at[loc].add(dI_row)
        if commute is not None:
            commute_old = tsl(commute, 1)  # [M, W] — just a slice
        elif ctx.Cstar_bsr is not None:
            commute_old = ctx.Cstar_bsr.matmul(I_old / ctx.N[:, None])
        else:
            commute_old = ctx.Cstar @ (I_old / ctx.N[:, None])
        dI = dI_row / ctx.N[loc]  # rank-1: only loc changed
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
                   commute=None):
        """Delta log-lik for moving x events of transition k, loc row,
        from t_from to t_to — evaluated from the *pre-move* tensors."""
        T = events.shape[-2]
        s = jnp.clip(jnp.minimum(t_from, t_to), 0, T - self.window)
        return self._delta(
            events, state, loc, s, k, t_from, t_to, x, occult=False,
            commute=commute,
        )

    def apply_commute(self, commute, loc, t_from, t_to, x, k, occult=False):
        """Keeps a threaded ``commute = Cstar @ (I/N)`` consistent with an
        applied event delta: a rank-1 column update when the delta touches
        I (k == 1; E->I moves/occults), a no-op otherwise.  Mirrors
        :func:`apply_event_delta`'s state update (same ``w`` indicator;
        occult ``x`` is signed); linear in x, so the revert-if-rejected
        inverse applies identically."""
        if commute is None or k != 1:
            return commute
        ctx = self.ctx
        T = commute.shape[-1]
        dtype = commute.dtype
        ts = jnp.arange(T)
        if occult:
            w = (ts > t_to).astype(dtype)
        else:
            w = (ts > t_to).astype(dtype) - (ts > t_from).astype(dtype)
        return commute + ctx.Cstar[:, loc][:, None] * (
            (x / ctx.N[loc]) * w
        )[None, :]

    def joint_move_delta(self, events, state, locs, t_from, t_to, xs, k,
                         commute=None):
        """Exact total delta for applying ALL L moves at once (one eval).

        ``locs [L]`` must be distinct (the kernels sample without
        replacement); all tensors are the *pre-move* ones.  Equals the
        telescoped sum of serial :meth:`move_delta` + apply — but in one
        launch instead of L serial windowed evals (the event sweep was
        launch-bound: ~30 tiny serial evals per draw at UK scale).

        k == 0: rows are disjoint and no rate changes — the joint delta is
        the sum of independent per-row deltas (vmapped :meth:`move_delta`).

        k == 1: the L moves jointly perturb I, so the all-location
        rate-only cells get a rank-L commute update over the union of the
        L windows; overlapping window columns are counted once (the cell
        delta is evaluated with the JOINT I change, so a single count is
        exact).  The per-row E->I / I->R terms stay disjoint.
        """
        T = events.shape[-2]
        W = self.window
        dtype = events.dtype
        ctx = self.ctx
        s = jnp.clip(jnp.minimum(t_from, t_to), 0, T - W)  # [L]

        if k == 0:
            f = lambda loc, t_f, t_d, x: self.move_delta(
                events, state, loc, t_f, t_d, x, 0, commute=commute
            )
            return jnp.sum(jax.vmap(f)(locs, t_from, t_to, xs))

        L = locs.shape[0]
        if L * W >= T:
            # Full-T evaluation of the all-location rate-only term: when
            # the L windows jointly cover at least all of [0, T) (at UK
            # scale L=2, W=dmax+1=85, T=120), slicing LOSES — L*[M,W]
            # reads exceed one [M,T] read, and the dynamic slices +
            # count-once dedup mask add ~10 serial launches.  Exact:
            # every cell whose rate did not change contributes a bitwise
            # -zero difference (r_new is computed from identical inputs).
            delta = self._joint_rate_delta_full(
                events, state, locs, t_from, t_to, xs, commute
            )
            delta += jnp.sum(
                jax.vmap(
                    lambda loc, si, t_f, t_d, x: self._row_term_ei(
                        events, state, loc, si, t_f, t_d, x
                    )
                )(locs, s, t_from, t_to, xs)
            )
            return delta
        p = s[:, None] + jnp.arange(W)[None, :]  # [i=L, W] window columns

        # --- all-location rate-only cells over the L windows -------------
        # Everything stays in window-major [L, M, W] layout (the natural
        # vmapped-slice output — no transposes; an earlier [M, L, W] +
        # reshape layout cost more in data movement than the joint eval
        # saved in launches at MSOA scale).
        # w_cross[j, i, :]: move j's state-change indicator at window i's
        # columns; the joint dI at any column is the sum over j.
        w_cross = (p[None, :, :] > t_to[:, None, None]).astype(dtype) - (
            p[None, :, :] > t_from[:, None, None]
        ).astype(dtype)  # [j, i, W]
        add = xs[:, None, None] * w_cross  # [j, i, W] raw I deltas

        def wslices(a):  # [M, T] -> [L, M, W] per-window slices
            return jax.vmap(
                lambda si: jax.lax.dynamic_slice_in_dim(a, si, W, axis=1)
            )(s)

        I_old = wslices(state[..., 2])  # [L, M, W]
        # joint dI into the moved rows via a one-hot contraction (a
        # multi-row scatter-add here measured ~ms-slow on TPU)
        onehot = (
            locs[:, None] == jnp.arange(events.shape[0])[None, :]
        ).astype(dtype)  # [j, M]
        I_new = I_old + jnp.einsum("jm,jlw->lmw", onehot, add)
        if commute is not None:
            commute_old = wslices(commute)  # [L, M, W] — just slices
        else:
            ion = I_old / ctx.N[None, :, None]
            if ctx.Cstar_bsr is not None:
                commute_old = jax.vmap(ctx.Cstar_bsr.matmul)(ion)
            else:
                commute_old = jnp.einsum("mn,lnw->lmw", ctx.Cstar, ion)
        commute_new = commute_old + jnp.einsum(
            "mj,jlw->lmw",
            ctx.Cstar[:, locs],
            add / ctx.N[locs][:, None, None],
        )
        pref = wslices(ctx.exp_eta) / ctx.N[None, :, None]  # [L, M, W]
        pw = jax.vmap(
            lambda si: jax.lax.dynamic_slice_in_dim(ctx.psi_w, si, W)
        )(s)[:, None, :]  # [L, 1, W]
        r_old = pref * (I_old + pw * commute_old) + RATE_EPS
        r_new = pref * (I_new + pw * commute_new) + RATE_EPS
        cells = _rate_diff_no_lgamma(
            wslices(state[..., 0]), wslices(events[..., 0]), r_old, r_new
        )  # [L, M, W]
        # count-once mask: window i's column is dropped if it also lies in
        # an earlier window j < i (that copy already carries the joint dI)
        in_win = (p[None, :, :] >= s[:, None, None]) & (
            p[None, :, :] < (s + W)[:, None, None]
        )  # [j, i, W]
        earlier = jnp.arange(L)[:, None] > jnp.arange(L)[None, :]  # i > j
        dup = jnp.any(in_win & earlier.T[:, :, None], axis=0)  # [i, W]
        delta = jnp.sum(cells * (~dup).astype(dtype)[:, None, :])

        # --- per-row E->I / I->R terms (disjoint rows) --------------------
        delta += jnp.sum(
            jax.vmap(
                lambda loc, si, t_f, t_d, x: self._row_term_ei(
                    events, state, loc, si, t_f, t_d, x
                )
            )(locs, s, t_from, t_to, xs)
        )
        return delta

    def _row_term_ei(self, events, state, loc, si, t_f, t_d, x):
        """One moved row's E->I (n_E, ev1) and I->R (n_I) window terms."""
        ctx = self.ctx
        W = self.window
        dtype = events.dtype
        stoich_k = jnp.asarray(_STOICH[1], dtype)
        row_old = jax.lax.dynamic_slice(
            state[loc], (si, 0), (W, state.shape[-1])
        )
        evrow_old = jax.lax.dynamic_slice(
            events[loc], (si, 0), (W, events.shape[-1])
        )
        pp = si + jnp.arange(W)
        w_pp = (pp > t_d).astype(dtype) - (pp > t_f).astype(dtype)
        row_new = row_old + x * w_pp[:, None] * stoich_k[None, :]
        ev_d = jnp.where(pp == t_d, x, 0.0) - jnp.where(pp == t_f, x, 0.0)
        evrow_new = evrow_old.at[:, 1].add(ev_d)
        rate_ir = jax.lax.dynamic_slice_in_dim(ctx.rate_ir_t, si, W)
        lp_old = binomial_log_pmf_from_rate(
            row_old[:, 1], evrow_old[:, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(
            row_old[:, 2], evrow_old[:, 2], rate_ir
        )
        lp_new = binomial_log_pmf_from_rate(
            row_new[:, 1], evrow_new[:, 1], ctx.nu
        ) + binomial_log_pmf_from_rate(
            row_new[:, 2], evrow_new[:, 2], rate_ir
        )
        return jnp.sum(lp_new - lp_old)

    def _joint_rate_delta_full(
        self, events, state, locs, t_from, t_to, xs, commute
    ):
        """All-location S->E rate-only delta of L joint E->I moves,
        evaluated over the FULL time axis (no windows, no dedup mask)."""
        M, T = events.shape[0], events.shape[-2]
        dtype = events.dtype
        ctx = self.ctx
        ts = jnp.arange(T)
        # [L, T] per-move I-change indicators (open-closed intervals)
        w_full = (ts[None, :] > t_to[:, None]).astype(dtype) - (
            ts[None, :] > t_from[:, None]
        ).astype(dtype)
        add = xs[:, None] * w_full * jnp.asarray(_STOICH[1][2], dtype)
        I_old = state[..., 2]  # [M, T]
        onehot = (locs[:, None] == jnp.arange(M)[None, :]).astype(
            dtype
        )  # [L, M]
        I_new = I_old + jnp.einsum("jm,jt->mt", onehot, add)
        if commute is not None:
            commute_old = commute  # [M, T] — already live
        elif ctx.Cstar_bsr is not None:
            commute_old = ctx.Cstar_bsr.matmul(I_old / ctx.N[:, None])
        else:
            commute_old = ctx.Cstar @ (I_old / ctx.N[:, None])
        commute_new = commute_old + ctx.Cstar[:, locs] @ (
            add / ctx.N[locs][:, None]
        )
        pref = ctx.exp_eta / ctx.N[:, None]
        r_old = pref * (I_old + ctx.psi_w[None, :] * commute_old) + RATE_EPS
        r_new = pref * (I_new + ctx.psi_w[None, :] * commute_new) + RATE_EPS
        return jnp.sum(
            _rate_diff_no_lgamma(
                state[..., 0], events[..., 0], r_old, r_new
            )
        )

    def occult_delta(self, events, state, loc, t, x_signed, k,
                     commute=None):
        """Delta log-lik for adding/deleting ``|x_signed|`` occult events of
        transition k at (loc, t) — evaluated from the pre-update tensors.

        State changes for all t' > t, so the slice [T - window, T) is exact
        iff t >= T - window.  Contract: construct this evaluator with
        ``window = T - t_range[0]`` (the driver/gibbs layer does) so every
        in-range occult's affected cells fit the static window."""
        T = events.shape[-2]
        s = jnp.asarray(T - self.window)
        return self._delta(
            events, state, loc, s, k, t, t, x_signed, occult=True,
            commute=commute,
        )


class FullEvaluator(NamedTuple):
    """Full re-evaluation of a caller-supplied density (generic; used by
    toy-target tests and as the reference for delta-consistency tests).
    Materializes the proposed tensor internally — O(M*T) per proposal."""

    logp_fn: Callable  # events -> scalar

    def move_delta(self, events, state, loc, t_from, t_to, x, k,
                   commute=None):
        events_new, _ = apply_event_delta(
            events, state, loc, t_from, t_to, x, k
        )
        return self.logp_fn(events_new) - self.logp_fn(events)

    def apply_commute(self, commute, loc, t_from, t_to, x, k, occult=False):
        """No-op: full re-evaluation never consults a threaded commute
        (callers pass ``commute=None`` with this evaluator)."""
        return commute

    def joint_move_delta(self, events, state, locs, t_from, t_to, xs, k,
                         commute=None):
        events_new, _ = apply_event_deltas(
            events, state, locs, t_from, t_to, xs, k
        )
        return self.logp_fn(events_new) - self.logp_fn(events)

    def occult_delta(self, events, state, loc, t, x_signed, k,
                     commute=None):
        events_new, _ = apply_event_delta(
            events, state, loc, t, t, x_signed, k, occult=True
        )
        return self.logp_fn(events_new) - self.logp_fn(events)
