"""Fused event-sweep Pallas kernel: the whole 4-kernel multiscan in VMEM.

The production event sweep (``inference/gibbs.py``: U multiscans of
move S->E, move E->I, occult S->E, occult E->I — the reference's
``MultiScanKernel(GibbsKernel([...]))`` stack,
``/root/reference/covid19uk/inference/mcmc_kernel_factory.py:116-168``)
is, on the XLA path, ~20 serially dependent small kernel launches per
draw: each MH application is a handful of tiny proposal ops, an
O(M x window) likelihood delta, and a few dynamic-slice applies, with
every intermediate bounced through HBM.  The round-4 profile
(``docs/profile_uk.md``) measured ~0.49 ms per application against
~25 us of theoretical HBM time for its bytes.

This kernel runs the ENTIRE sweep — all U multiscans x 4 kernels — as
ONE ``pallas_call`` per chain (vmapped over chains: the chain axis
becomes the leading grid dimension), with the chain's event/state/commute
planes resident in VMEM throughout:

* zero HBM round-trips between the 20 applications (one load + one store
  of the per-chain planes per draw);
* the per-draw randomness is a precomputed uniform table (threefry in
  XLA land, [U, WTAB] scalars + [U, T, 128] time-gumbel lanes per
  chain), so the kernel is a *deterministic function of its inputs* —
  bit-reproducible given the JAX key, testable in interpret mode on
  CPU, and free of the TPU-core PRNG.

Mosaic (the Pallas TPU compiler) cannot prove alignment for
dynamically-offset sublane slices and rejects dynamic lane indexing, so
all per-location reads/writes use MASKED full-plane ops instead of
``pl.ds`` gathers: a column read is ``sum(where(lane == loc, plane, 0),
axis=1)``, a scatter-add is ``plane += col * (lane == loc)``.  The
planes live in VMEM, so each masked pass costs ~50 ns at UK scale
([120, 384] f32) — three orders of magnitude below the HBM launch
overhead this kernel removes.  For the same reason the E->I rate-only
delta always evaluates the full [T, M] block (no narrow-window branch:
cells outside the perturbation window cancel bitwise, and the full
block is ~1 us of VPU time in VMEM).

Proposal distributions, Hastings corrections, and accept rules match
``inference/event_kernels.py`` exactly (same two-sided/truncated
geometric samplers, same null-move semantics, same guided-occult
categorical via Gumbel-argmax).  The binomial log-pmf uses the same
cancellation-free Stirling forms as ``ops/binomial.py``; Pallas TPU has
no ``lgamma``/``expm1``/``log1p`` lowerings, so the small-argument
branch substitutes a shifted Stirling series (absolute error < 1e-5 —
the same order as the f32 path's own round-off; each MH kernel remains
exactly reversible w.r.t. the density it evaluates, see
``tests/test_fused_sweep.py``).

Layout: time-major ``[T, M]`` planes (time on sublanes, locations on
lanes) so location vectors (guide logits, Cstar rows) are lane vectors
and the symmetric ``Cstar`` (models/spec.py:120) serves column reads as
row reads.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import RATE_EPS

NU = float(seir.NU)
_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
# log(p) for the constant E->I rate: p = 1 - exp(-NU)
_LOG_P_NU = math.log(-math.expm1(-NU))
_NEG_INF = -jnp.inf

# Lane width of the per-multiscan time-gumbel tensor ([U, T, _LT]); the
# first 2 * mmax lanes are used (kernel k, slot i -> lane k * mmax + i).
_LT = 128


# ---------------------------------------------------------------------------
# In-kernel numerics (Pallas TPU lacks lgamma/expm1/log1p).  Same accuracy
# strategy as ops/binomial.py; scalar/vector forms shared with the repo's
# earlier fused-likelihood kernel (git history <= 0cc3f71).
# ---------------------------------------------------------------------------


def _log1p(x):
    """log1p without the primitive: exact form for x > 1e-3, Taylor below."""
    big = jnp.log(1.0 + jnp.maximum(x, 1e-3))
    small = x * (1.0 - x * (0.5 - x / 3.0))
    return jnp.where(x > 1e-3, big, small)


def _stirling(z):
    """3-term Stirling: valid to ~3e-6 for z >= 3."""
    inv = 1.0 / z
    return (
        (z - 0.5) * jnp.log(z)
        - z
        + _HALF_LOG_2PI
        + inv * (1.0 / 12.0 - inv * inv * (1.0 / 360.0))
    )


def lgamma_diff(n, k):
    """lgamma(n+1) - lgamma(n-k+1), cancellation-free (0 <= k <= n).

    The recombined Stirling difference of ops/binomial.py:26-63, with the
    small-b direct-lgamma branch replaced by a shift-by-2 recurrence (the
    shifted arguments land where the series is accurate)."""
    b = n - k + 1.0
    a_s = n + 3.0  # (n+1) shifted by 2
    b_s = b + 2.0  # >= 3 for valid inputs
    s_diff = (
        (a_s - 0.5) * _log1p(k / b_s)
        + k * jnp.log(b_s)
        - k
        + (1.0 / 12.0) * (1.0 / a_s - 1.0 / b_s)
        - (1.0 / 360.0) * (1.0 / a_s**3 - 1.0 / b_s**3)
    )
    # un-shift: lgamma(n+1)-lgamma(n-k+1)
    #   = [lgamma(n+3)-lgamma(b+2)] - log((n+1)(n+2)) + log(b(b+1))
    #   = s_diff - log1p(k/b) - log1p(k/(b+1))
    return s_diff - _log1p(k / b) - _log1p(k / (b + 1.0))


def lgamma1p(k):
    """lgamma(k+1) via shift-by-4 Stirling; valid for k >= 0."""
    z = k + 1.0
    return (
        _stirling(z + 4.0)
        - jnp.log(z)
        - jnp.log(z + 1.0)
        - jnp.log(z + 2.0)
        - jnp.log(z + 3.0)
    )


def log_pm(r):
    """log(1 - exp(-r)) for r > 0, stable at both ends without expm1."""
    r_safe = jnp.maximum(r, 1e-30)
    em = jnp.exp(-r_safe)
    mid = jnp.log(jnp.maximum(1.0 - em, 1e-30))
    small = jnp.log(r_safe) + jnp.log(
        1.0 - r_safe * (0.5 - r_safe * (1.0 / 6.0 - r_safe / 24.0))
    )
    large = -em * (1.0 + em * (0.5 + em / 3.0))
    return jnp.where(r > 5.0, large, jnp.where(r > 1e-2, mid, small))


def binom_lp_rate(n, y, r):
    """Binomial log-pmf with p = 1 - exp(-r) (ops/binomial.py:92-104);
    -inf where (y < 0) | (y > n) | (n < 0)."""
    valid = (y >= 0.0) & (y <= n) & (n >= 0.0)
    n_ = jnp.where(valid, n, 1.0)
    y_ = jnp.where(valid, y, 0.0)
    r_ = jnp.maximum(r, 1e-30)
    lp = (
        lgamma_diff(n_, y_)
        - lgamma1p(y_)
        + y_ * log_pm(r_)
        - (n_ - y_) * r_
    )
    return jnp.where(valid, lp, _NEG_INF)


def binom_lp_nu(n, y):
    """Binomial log-pmf at the constant E->I rate NU."""
    valid = (y >= 0.0) & (y <= n) & (n >= 0.0)
    n_ = jnp.where(valid, n, 1.0)
    y_ = jnp.where(valid, y, 0.0)
    lp = lgamma_diff(n_, y_) - lgamma1p(y_) + y_ * _LOG_P_NU - (n_ - y_) * NU
    return jnp.where(valid, lp, _NEG_INF)


def rate_diff(n, k, r_old, r_new):
    """Log-pmf delta when only the rate changed (likelihood.py:138-145)."""
    return k * (log_pm(r_new) - log_pm(r_old)) - (n - k) * (r_new - r_old)


# ---------------------------------------------------------------------------
# Scalar proposal samplers (event_kernels.py:98-160, traced-decay branch).
# All take uniforms in [0, 1) instead of keys.
# ---------------------------------------------------------------------------


def _clip_decay(decay):
    return jnp.clip(decay, 1e-3, 1.0 - 1e-6)


def _powf(base, expo):
    """base**expo for base > 0: Mosaic has no math.powf lowering."""
    return jnp.exp(expo * jnp.log(base))


def _two_sided_geometric(u_side, u_j, left, right, decay):
    """d ~ decay^(|d|-1) on {-left..-1} u {1..right}; returns (d, log_mass)."""
    decay = _clip_decay(decay)
    left_f = left.astype(jnp.float32)
    right_f = right.astype(jnp.float32)
    mass_l = 1.0 - _powf(decay, left_f)
    mass_r = 1.0 - _powf(decay, right_f)
    total = jnp.maximum(mass_l + mass_r, 1e-30)
    go_right = u_side < mass_r / total
    side_len = jnp.where(go_right, right_f, left_f)
    side_mass = 1.0 - _powf(decay, side_len)
    j = jnp.ceil(
        jnp.log(jnp.maximum(1.0 - u_j * side_mass, 1e-30)) / jnp.log(decay)
    )
    j = jnp.clip(j, 1.0, jnp.maximum(side_len, 1.0))
    d = jnp.where(go_right, j, -j).astype(jnp.int32)
    return d, jnp.log(total)


def _truncated_geometric(u, cap, decay):
    """x ~ decay^(x-1) on {1..cap}; returns (x, log_mass)."""
    decay = _clip_decay(decay)
    cap_f = jnp.maximum(cap, 1.0)
    mass = 1.0 - _powf(decay, cap_f)
    x = jnp.ceil(
        jnp.log(jnp.maximum(1.0 - u * mass, 1e-30)) / jnp.log(decay)
    )
    return jnp.clip(x, 1.0, cap_f), jnp.log(jnp.maximum(mass, 1e-30))


def _log_mass_geometric(cap, decay):
    decay = _clip_decay(decay)
    cap_f = jnp.maximum(cap, 1.0)
    return jnp.log(jnp.maximum(1.0 - _powf(decay, cap_f), 1e-30))


def _gumbel(u):
    u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
    return -jnp.log(-jnp.log(u))


# ---------------------------------------------------------------------------
# Uniform-table offset map (static per build).
# ---------------------------------------------------------------------------


class _Offsets:
    """Column offsets of one multiscan's SCALAR uniforms in the [U, WTAB]
    table.  Per-location time gumbels live in the separate [U, T, _LT]
    tensor (Mosaic cannot transpose a lane row into a sublane column, so
    they are generated sublane-major from the start)."""

    def __init__(self, M, mmax):
        off = 0

        def seg(n):
            nonlocal off
            a = off
            off += n
            return a

        # move S->E / move E->I: loc gumbels, side/j/x per slot, acc
        self.move = []
        for _ in range(2):
            self.move.append(
                dict(
                    loc=seg(M),
                    side=seg(mmax),
                    j=seg(mmax),
                    x=seg(mmax),
                    acc=seg(1),
                )
            )
        # occult S->E / E->I: loc gumbels, t, dir, x, acc
        self.occ = []
        for _ in range(2):
            self.occ.append(
                dict(loc=seg(M), t=seg(1), dir=seg(1), x=seg(1), acc=seg(1))
            )
        self.width = -(-off // 128) * 128  # round up to a lane tile


# Trace row layout: [acc, logp_after, m*mmax, t*mmax, d*mmax, x*mmax]
def _trace_width(mmax):
    return 2 + 4 * mmax


# The per-chain trace comes back as ONE [8, 128] f32 VMEM tile (rows 0-3 =
# move_se/move_ei/occult_se/occult_ei of the last multiscan).  Mosaic
# rejects scalar stores to VMEM and vmap-batched SMEM outputs (the (C, 1)
# block fails the 8x128 divisibility rule), so the tile is built as a
# functional carry with lane/sublane masks and stored once.  The final
# logp is the occult_ei row's logp_after column (written after the last
# kernel of the last multiscan).
_TILE = (8, 128)


# ---------------------------------------------------------------------------
# Kernel factory
# ---------------------------------------------------------------------------


def _build_kernel(M, T, U, mmax, nmax, dmax, occult_nmax, t_lo, t_hi,
                  occult_guided, guide_floor):
    offs = _Offsets(M, mmax)
    nmax_f = float(nmax)
    onmax_f = float(occult_nmax)

    def kernel(tbl_ref, ttbl_ref, ev_in, st_in, cm_in, lp_in,
               eta_ref, pw_ref, rir_ref, ncol_ref, cs_ref, dec_ref,
               ev_ref, st_ref, cm_ref, tile_ref):
        # copy-in (no input/output aliasing under vmap; VMEM copies are
        # cheap next to the HBM load already paid)
        ev_ref[...] = ev_in[...]
        st_ref[...] = st_in[...]
        cm_ref[...] = cm_in[...]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)  # [1, M]
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, _LT), 1)
        sub_t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)  # [T, 1]
        sub_u = jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0)  # [U, 1]
        sub_u3 = jax.lax.broadcasted_iota(jnp.int32, (U, 1, 1), 0)
        tile_r = jax.lax.broadcasted_iota(jnp.int32, _TILE, 0)
        tile_c = jax.lax.broadcasted_iota(jnp.int32, _TILE, 1)

        def tile_put(tile, r, vals):
            """Set tile[r, j] = vals[j] via masks (no scalar VMEM stores)."""
            for j, v in enumerate(vals):
                tile = jnp.where((tile_r == r) & (tile_c == j), v, tile)
            return tile

        if occult_guided:
            # case_guide_logits (gibbs.py:183-205): observed I->R cases
            # over the occult window + uniform floor.  events[..., 2] is
            # never modified by any kernel, so compute once.
            cases_w = jnp.sum(
                ev_ref[2, t_lo:t_hi, :], axis=0, keepdims=True
            )  # [1, M]
            total = jnp.sum(cases_w)
            guide = jnp.log(
                jnp.where(
                    total > 0,
                    (1.0 - guide_floor) * cases_w / jnp.maximum(total, 1.0),
                    0.0,
                )
                + guide_floor / M
            )  # [1, M]
        else:
            guide = None

        def pick_locations(g):
            """mmax distinct locations via Gumbel-top-k over [1, M]."""
            locs = []
            for _ in range(mmax):
                loc = jnp.argmax(g, axis=1)[0].astype(jnp.int32)
                locs.append(loc)
                g = jnp.where(lane == loc, _NEG_INF, g)
            return locs

        def col_of(plane, loc):
            """plane[:, loc] as a [T, 1] sublane vector (masked reduce —
            Mosaic rejects dynamic lane offsets)."""
            return jnp.sum(
                jnp.where(lane == loc, plane, 0.0), axis=1, keepdims=True
            )

        def add_col(ref, plane, loc, delta):
            """ref[plane][:, loc] += delta ([T, 1]) via lane-masked RMW."""
            ref[plane, :, :] += delta * (lane == loc).astype(jnp.float32)

        def n_at(loc):
            return jnp.sum(jnp.where(lane == loc, ncol_ref[...], 0.0))

        def cstar_row(loc):
            """Cstar[:, loc] as [1, M] — symmetric, so reduce the rows."""
            sub_m = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
            return jnp.sum(
                jnp.where(sub_m == loc, cs_ref[...], 0.0),
                axis=0, keepdims=True,
            )

        def rate_se_col(loc, i_col, cm_col):
            """S->E rate at one location over [T, 1]."""
            eta_col = col_of(eta_ref[...], loc)
            return (
                eta_col * (i_col + pw_ref[...] * cm_col) / n_at(loc)
                + RATE_EPS
            )

        # ------------------------------------------------------------------
        # One move kernel application (k = 0: S->E, k = 1: E->I); returns lp.
        # Mirrors event_kernels._propose_moves / event_move_step.
        # ------------------------------------------------------------------
        def move_kernel(k, row, tsel, lp, tile, decay, x_decay, trace_row):
            o = offs.move[k]
            g = _gumbel(row[:, o["loc"]:o["loc"] + M])  # [1, M]
            locs = pick_locations(g)

            # per-location proposal scalars
            t_srcs, t_dsts, ds_, xs = [], [], [], []
            hastings = jnp.float32(0.0)
            for i in range(mmax):
                loc = locs[i]
                cnt = col_of(ev_ref[k, :, :], loc)  # [T, 1]
                mask = cnt > 0
                n_nz = jnp.sum(mask.astype(jnp.int32))
                # time gumbels for (kernel k, slot i): lane k*mmax+i of
                # the selected [T, _LT] block
                gt = _gumbel(
                    jnp.sum(
                        jnp.where(lane_t == (k * mmax + i), tsel, 0.0),
                        axis=1, keepdims=True,
                    )
                )  # [T, 1]
                t_src = jnp.argmax(
                    jnp.where(mask, gt, _NEG_INF), axis=0
                )[0].astype(jnp.int32)
                left = jnp.minimum(dmax, t_src)
                right = jnp.minimum(dmax, T - 1 - t_src)
                d, lm_fwd = _two_sided_geometric(
                    row[0, o["side"] + i], row[0, o["j"] + i],
                    left, right, decay,
                )
                count_src = jnp.sum(
                    jnp.where(sub_t == t_src, cnt, 0.0)
                )
                cap_fwd = jnp.minimum(nmax_f, count_src)
                x, lm_x_fwd = _truncated_geometric(
                    row[0, o["x"] + i], cap_fwd, x_decay
                )
                active = (n_nz > 0) & (left + right > 0)
                x_eff = jnp.where(active, x, 0.0)
                t_dst = jnp.clip(t_src + d, 0, T - 1)

                # reverse-side masses from the locally updated count row
                w_ev = (
                    jnp.where(sub_t == t_dst, x_eff, 0.0)
                    - jnp.where(sub_t == t_src, x_eff, 0.0)
                )
                cnt_new = cnt + w_ev
                n_nz_new = jnp.sum((cnt_new > 0).astype(jnp.int32))
                count_dst_new = jnp.sum(
                    jnp.where(sub_t == t_dst, cnt_new, 0.0)
                )
                cap_rev = jnp.minimum(nmax_f, count_dst_new)
                left_r = jnp.minimum(dmax, t_dst)
                right_r = jnp.minimum(dmax, T - 1 - t_dst)
                dec_c = _clip_decay(decay)
                mass_rev = (
                    1.0 - _powf(dec_c, left_r.astype(jnp.float32))
                ) + (1.0 - _powf(dec_c, right_r.astype(jnp.float32)))
                lq = (
                    -jnp.log(jnp.maximum(n_nz_new, 1).astype(jnp.float32))
                    - _log_mass_geometric(cap_rev, x_decay)
                    - jnp.log(jnp.maximum(mass_rev, 1e-30))
                ) - (
                    -jnp.log(jnp.maximum(n_nz, 1).astype(jnp.float32))
                    - lm_x_fwd
                    - lm_fwd
                )
                hastings = hastings + jnp.where(active, lq, 0.0)
                t_srcs.append(t_src)
                t_dsts.append(t_dst)
                ds_.append(d)
                xs.append(x_eff)

            # --- likelihood delta -----------------------------------------
            if k == 0:
                # rows are disjoint, no rate changes: per-loc deltas from
                # the PRE-move planes (likelihood.py _delta k==0 over the
                # full row — unchanged cells cancel bitwise)
                delta = jnp.float32(0.0)
                for i in range(mmax):
                    loc, ts_, td_, x = (
                        locs[i], t_srcs[i], t_dsts[i], xs[i],
                    )
                    w = (
                        (sub_t > td_).astype(jnp.float32)
                        - (sub_t > ts_).astype(jnp.float32)
                    )  # [T, 1]
                    s_row = col_of(st_ref[0, :, :], loc)
                    e_row = col_of(st_ref[1, :, :], loc)
                    ev0 = col_of(ev_ref[0, :, :], loc)
                    ev1 = col_of(ev_ref[1, :, :], loc)
                    i_row = col_of(st_ref[2, :, :], loc)
                    cm_col = col_of(cm_ref[...], loc)
                    rate = rate_se_col(loc, i_row, cm_col)
                    ev_d = (
                        jnp.where(sub_t == td_, x, 0.0)
                        - jnp.where(sub_t == ts_, x, 0.0)
                    )
                    lp_old = binom_lp_rate(s_row, ev0, rate) + binom_lp_nu(
                        e_row, ev1
                    )
                    lp_new = binom_lp_rate(
                        s_row - x * w, ev0 + ev_d, rate
                    ) + binom_lp_nu(e_row + x * w, ev1)
                    delta = delta + jnp.sum(lp_new - lp_old)

                log_alpha = delta + hastings
                acc = jnp.log(
                    jnp.clip(row[0, o["acc"]], 1e-38, 1.0)
                ) < log_alpha
                # single apply post-decision (rejected x masked to zero)
                for i in range(mmax):
                    loc, ts_, td_ = locs[i], t_srcs[i], t_dsts[i]
                    x = jnp.where(acc, xs[i], 0.0)
                    w = (
                        (sub_t > td_).astype(jnp.float32)
                        - (sub_t > ts_).astype(jnp.float32)
                    )
                    ev_d = (
                        jnp.where(sub_t == td_, x, 0.0)
                        - jnp.where(sub_t == ts_, x, 0.0)
                    )
                    add_col(ev_ref, 0, loc, ev_d)
                    add_col(st_ref, 0, loc, -x * w)
                    add_col(st_ref, 1, loc, x * w)
                lp = lp + jnp.where(acc, delta, 0.0)
            else:
                # k == 1: telescoped per-loc eval + tentative apply; the
                # all-location rate-only cells run over the FULL [T, M]
                # block (VMEM-resident: ~1 us; unchanged cells cancel)
                delta = jnp.float32(0.0)
                for i in range(mmax):
                    loc, ts_, td_, x = (
                        locs[i], t_srcs[i], t_dsts[i], xs[i],
                    )
                    w = (
                        (sub_t > td_).astype(jnp.float32)
                        - (sub_t > ts_).astype(jnp.float32)
                    )  # [T, 1]
                    # per-row E->I / I->R terms (current planes)
                    e_row = col_of(st_ref[1, :, :], loc)
                    i_row = col_of(st_ref[2, :, :], loc)
                    ev1 = col_of(ev_ref[1, :, :], loc)
                    ev2 = col_of(ev_ref[2, :, :], loc)
                    ev_d = (
                        jnp.where(sub_t == td_, x, 0.0)
                        - jnp.where(sub_t == ts_, x, 0.0)
                    )
                    lp_old = binom_lp_nu(e_row, ev1) + binom_lp_rate(
                        i_row, ev2, rir_ref[...]
                    )
                    lp_new = binom_lp_nu(
                        e_row - x * w, ev1 + ev_d
                    ) + binom_lp_rate(i_row + x * w, ev2, rir_ref[...])
                    delta = delta + jnp.sum(lp_new - lp_old)

                    # all-location rate-only cells, full T
                    n_loc = n_at(loc)
                    cs_row = cstar_row(loc)  # [1, M]
                    S_c = st_ref[0, :, :]
                    y0_c = ev_ref[0, :, :]
                    I_c = st_ref[2, :, :]
                    cm_c = cm_ref[...]
                    pref = eta_ref[...] / ncol_ref[...]
                    dI = x * w * (lane == loc).astype(jnp.float32)
                    dcm = (x / n_loc) * w * cs_row
                    r_old = pref * (I_c + pw_ref[...] * cm_c) + RATE_EPS
                    r_new = (
                        pref * (I_c + dI + pw_ref[...] * (cm_c + dcm))
                        + RATE_EPS
                    )
                    delta = delta + jnp.sum(
                        rate_diff(S_c, y0_c, r_old, r_new)
                    )

                    # tentative apply (telescoping: the next loc's eval
                    # must see this loc's change)
                    add_col(ev_ref, 1, loc, ev_d)
                    add_col(st_ref, 1, loc, -x * w)
                    add_col(st_ref, 2, loc, x * w)
                    cm_ref[...] += (x / n_loc) * w * cs_row

                log_alpha = delta + hastings
                acc = jnp.log(
                    jnp.clip(row[0, o["acc"]], 1e-38, 1.0)
                ) < log_alpha

                # revert on reject
                @pl.when(jnp.logical_not(acc))
                def _():
                    for i in range(mmax):
                        loc, ts_, td_, x = (
                            locs[i], t_srcs[i], t_dsts[i], xs[i],
                        )
                        w = (
                            (sub_t > td_).astype(jnp.float32)
                            - (sub_t > ts_).astype(jnp.float32)
                        )
                        ev_d = (
                            jnp.where(sub_t == td_, x, 0.0)
                            - jnp.where(sub_t == ts_, x, 0.0)
                        )
                        n_loc = n_at(loc)
                        cs_row = cstar_row(loc)
                        add_col(ev_ref, 1, loc, -ev_d)
                        add_col(st_ref, 1, loc, x * w)
                        add_col(st_ref, 2, loc, -x * w)
                        cm_ref[...] += -(x / n_loc) * w * cs_row

                lp = lp + jnp.where(acc, delta, 0.0)

            # trace row: [acc, logp, m..., t..., d..., x...]
            vals = (
                [acc.astype(jnp.float32), lp]
                + [l.astype(jnp.float32) for l in locs]
                + [t.astype(jnp.float32) for t in t_srcs]
                + [d.astype(jnp.float32) for d in ds_]
                + list(xs)
            )
            return lp, tile_put(tile, trace_row, vals)

        # ------------------------------------------------------------------
        # One occult kernel application (event_kernels.occult_step).
        # ------------------------------------------------------------------
        def occult_kernel(k, row, lp, tile, x_decay, trace_row):
            o = offs.occ[k]
            g = _gumbel(row[:, o["loc"]:o["loc"] + M])
            if guide is not None:
                g = g + guide
            loc = jnp.argmax(g, axis=1)[0].astype(jnp.int32)
            t = t_lo + jnp.floor(
                row[0, o["t"]] * (t_hi - t_lo)
            ).astype(jnp.int32)
            t = jnp.clip(t, t_lo, t_hi - 1)
            is_add = row[0, o["dir"]] < 0.5

            cnt = col_of(ev_ref[k, :, :], loc)  # [T, 1]
            count = jnp.sum(jnp.where(sub_t == t, cnt, 0.0))
            cap_del = jnp.minimum(onmax_f, count)
            u_x = row[0, o["x"]]
            x_add, _ = _truncated_geometric(u_x, jnp.float32(onmax_f), x_decay)
            x_del, _ = _truncated_geometric(u_x, cap_del, x_decay)
            can_delete = count > 0
            x = jnp.where(is_add, x_add, jnp.where(can_delete, x_del, 0.0))
            dx = jnp.where(is_add, x, -x)

            w = (sub_t > t).astype(jnp.float32)  # [T, 1]
            ev_d = jnp.where(sub_t == t, dx, 0.0)

            # --- delta ----------------------------------------------------
            if k == 0:
                s_row = col_of(st_ref[0, :, :], loc)
                e_row = col_of(st_ref[1, :, :], loc)
                ev0 = col_of(ev_ref[0, :, :], loc)
                ev1 = col_of(ev_ref[1, :, :], loc)
                i_row = col_of(st_ref[2, :, :], loc)
                cm_col = col_of(cm_ref[...], loc)
                rate = rate_se_col(loc, i_row, cm_col)
                delta = jnp.sum(
                    binom_lp_rate(s_row - dx * w, ev0 + ev_d, rate)
                    + binom_lp_nu(e_row + dx * w, ev1)
                    - binom_lp_rate(s_row, ev0, rate)
                    - binom_lp_nu(e_row, ev1)
                )
            else:
                e_row = col_of(st_ref[1, :, :], loc)
                i_row = col_of(st_ref[2, :, :], loc)
                ev1 = col_of(ev_ref[1, :, :], loc)
                ev2 = col_of(ev_ref[2, :, :], loc)
                delta = jnp.sum(
                    binom_lp_nu(e_row - dx * w, ev1 + ev_d)
                    + binom_lp_rate(i_row + dx * w, ev2, rir_ref[...])
                    - binom_lp_nu(e_row, ev1)
                    - binom_lp_rate(i_row, ev2, rir_ref[...])
                )
                # rate-only cells over the static occult window [t_lo, T)
                # (an occult at t >= t_lo perturbs only t' > t; static
                # slices need no alignment)
                n_loc = n_at(loc)
                cs_row = cstar_row(loc)
                wv = (sub_t[t_lo:, :] > t).astype(jnp.float32)
                S_c = st_ref[0, t_lo:, :]
                y0_c = ev_ref[0, t_lo:, :]
                I_c = st_ref[2, t_lo:, :]
                cm_c = cm_ref[t_lo:, :]
                eta_c = eta_ref[t_lo:, :]
                pw_c = pw_ref[t_lo:, :]
                pref = eta_c / ncol_ref[...]
                dI = dx * wv * (lane == loc).astype(jnp.float32)
                dcm = (dx / n_loc) * wv * cs_row
                r_old = pref * (I_c + pw_c * cm_c) + RATE_EPS
                r_new = pref * (I_c + dI + pw_c * (cm_c + dcm)) + RATE_EPS
                delta = delta + jnp.sum(rate_diff(S_c, y0_c, r_old, r_new))

            # --- Hastings (x caps only; loc/t/dir cancel) -------------------
            log_h_add = _log_mass_geometric(
                jnp.float32(onmax_f), x_decay
            ) - _log_mass_geometric(
                jnp.minimum(onmax_f, count + x_add), x_decay
            )
            log_h_del = _log_mass_geometric(
                cap_del, x_decay
            ) - _log_mass_geometric(jnp.float32(onmax_f), x_decay)
            hastings = jnp.where(is_add, log_h_add, log_h_del)

            is_null = jnp.logical_not(is_add) & jnp.logical_not(can_delete)
            log_alpha = delta + hastings
            acc = jnp.logical_not(is_null) & (
                jnp.log(jnp.clip(row[0, o["acc"]], 1e-38, 1.0)) < log_alpha
            )
            x_ap = jnp.where(acc, dx, 0.0)
            add_col(ev_ref, k, loc, jnp.where(sub_t == t, x_ap, 0.0))
            add_col(st_ref, k, loc, -x_ap * w)
            add_col(st_ref, k + 1, loc, x_ap * w)
            if k == 1:
                cm_ref[...] += (x_ap / n_at(loc)) * w * cstar_row(loc)
            lp = lp + jnp.where(acc, delta, 0.0)

            vals = [
                acc.astype(jnp.float32), lp, loc.astype(jnp.float32),
                t.astype(jnp.float32),
                jnp.where(is_add, 1.0, -1.0), jnp.abs(dx),
            ]
            return lp, tile_put(tile, trace_row, vals)

        # ------------------------------------------------------------------
        # U multiscans
        # ------------------------------------------------------------------
        def multiscan(u, carry):
            lp, tile = carry
            row = jnp.sum(
                jnp.where(sub_u == u, tbl_ref[...], 0.0),
                axis=0, keepdims=True,
            )  # [1, WTAB]
            tsel = jnp.sum(
                jnp.where(sub_u3 == u, ttbl_ref[...], 0.0), axis=0
            )  # [T, _LT]
            # dec = [move_decay_se, move_decay_ei, x_se, x_ei, x_occult]
            lp, tile = move_kernel(
                0, row, tsel, lp, tile, dec_ref[0], dec_ref[2], 0
            )
            lp, tile = move_kernel(
                1, row, tsel, lp, tile, dec_ref[1], dec_ref[3], 1
            )
            lp, tile = occult_kernel(0, row, lp, tile, dec_ref[4], 2)
            lp, tile = occult_kernel(1, row, lp, tile, dec_ref[4], 3)
            return lp, tile

        _, tile_final = jax.lax.fori_loop(
            0, U, multiscan,
            (lp_in[0, 0], jnp.zeros(_TILE, jnp.float32)),
        )
        tile_ref[...] = tile_final

    return kernel, offs


@functools.partial(
    jax.jit,
    static_argnames=(
        "mmax", "nmax", "dmax", "occult_nmax", "t_range", "num_updates",
        "occult_guided", "guide_floor", "interpret",
    ),
)
def fused_sweep(
    key,
    events,
    state,
    commute,
    logp,
    exp_eta,
    psi_w,
    rate_ir_t,
    N,
    Cstar,
    move_decay_se,
    move_decay_ei,
    x_decay,
    x_decay_se=None,
    x_decay_ei=None,
    *,
    mmax,
    nmax,
    dmax,
    occult_nmax,
    t_range,
    num_updates,
    occult_guided,
    guide_floor=0.1,
    interpret=False,
):
    """Runs the full U-multiscan event sweep for ONE chain (vmap for more).

    Args mirror the XLA sweep's carry (gibbs.py:338-380) plus the
    LikelihoodContext ingredients; ``commute`` is ALWAYS threaded (it lives
    in VMEM for the sweep's duration).  Decays are traced scalars — the
    driver's acceptance autotuning retunes them without recompiling.

    Returns ``(events, state, commute, logp, trace)`` with ``trace`` a
    ``[4, 2 + 4*mmax]`` f32 block per chain — rows (move_se, move_ei,
    occult_se, occult_ei) of the LAST multiscan (gemlib MultiScanKernel
    contract), columns ``[accepted, logp_after, m*, t*, d*, x*]``.
    """
    M, T, X = events.shape
    U = num_updates
    t_lo, t_hi = t_range
    kernel, offs = _build_kernel(
        M, T, U, mmax, nmax, dmax, occult_nmax, t_lo, t_hi,
        occult_guided, float(guide_floor),
    )

    f32 = jnp.float32
    k_tbl, k_ttbl = jax.random.split(key)
    tbl = jax.random.uniform(k_tbl, (U, offs.width), f32)
    ttbl = jax.random.uniform(k_ttbl, (U, T, _LT), f32)
    ev_tm = jnp.transpose(events.astype(f32), (2, 1, 0))  # [X, T, M]
    st_tm = jnp.transpose(state.astype(f32), (2, 1, 0))  # [S, T, M]
    cm_tm = jnp.transpose(commute.astype(f32), (1, 0))  # [T, M]
    eta_tm = jnp.transpose(exp_eta.astype(f32), (1, 0))  # [T, M]
    pw = psi_w.astype(f32)[:, None]  # [T, 1]
    rir = rate_ir_t.astype(f32)[:, None]  # [T, 1]
    ncol = N.astype(f32)[None, :]  # [1, M]
    cs = Cstar.astype(f32)
    # [move_decay_se, move_decay_ei, x_se, x_ei, x_occult]: the move
    # kernels' event-count decays are separately autotunable (the
    # round-5 measured binding factor on move acceptance); occults keep
    # the static config value.
    dec = jnp.stack(
        [
            jnp.asarray(move_decay_se, f32),
            jnp.asarray(move_decay_ei, f32),
            jnp.asarray(x_decay if x_decay_se is None else x_decay_se, f32),
            jnp.asarray(x_decay if x_decay_ei is None else x_decay_ei, f32),
            jnp.asarray(x_decay, f32),
        ]
    )
    # logp rides in as a broadcast VMEM tile: vmap-batched SMEM scalars
    # fail Mosaic's 8x128 block rule, and it is per-chain (batched).
    lp_in = jnp.full((1, 128), jnp.asarray(logp, f32))

    if _trace_width(mmax) > _TILE[1]:
        raise ValueError(f"mmax={mmax} overflows the trace tile")

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    S = st_tm.shape[0]
    ev_o, st_o, cm_o, tile_o = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((X, T, M), f32),
            jax.ShapeDtypeStruct((S, T, M), f32),
            jax.ShapeDtypeStruct((T, M), f32),
            jax.ShapeDtypeStruct(_TILE, f32),
        ),
        in_specs=[vmem, vmem, vmem, vmem, vmem, vmem,
                  vmem, vmem, vmem, vmem, vmem, smem],
        out_specs=(vmem, vmem, vmem, vmem),
        interpret=interpret,
    )(tbl, ttbl, ev_tm, st_tm, cm_tm, lp_in, eta_tm, pw, rir, ncol, cs, dec)

    dtype = events.dtype
    # final logp == the occult_ei trace row's logp_after (see _TILE note)
    return (
        jnp.transpose(ev_o, (2, 1, 0)).astype(dtype),
        jnp.transpose(st_o, (2, 1, 0)).astype(dtype),
        jnp.transpose(cm_o, (1, 0)).astype(dtype),
        tile_o[3, 1].astype(logp.dtype),
        tile_o[:4, : _trace_width(mmax)],
    )
