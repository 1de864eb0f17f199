"""Fused chain-binomial log-likelihood Pallas kernel with custom VJP.

The SEIR likelihood evaluation is the inner loop of both HMC (16 leapfrog
gradient evaluations per transition) and the full-likelihood paths.  This
kernel fuses, in one VMEM-resident pass per chain:

    commute  = (I/N) @ Cstar^T                 (MXU)
    rate_se  = exp_eta/N * I + psi_w*exp_eta/N * commute + eps
    loglik   = sum binom(S, y0 | rate_se) + binom(E, y1 | nu)
                 + binom(I, y2 | rate_ir)

avoiding the HBM round-trips of the unfused XLA graph (state, rates, and
logpmf intermediates).  The custom VJP computes the gradients with respect
to the three parameter-dependent rate ingredients (``exp_eta/N``,
``psi_w*exp_eta/N``, ``rate_ir``) in a second fused pass; ``n``/``y``
tensors are constants w.r.t. the parameters so their cotangents are zero.

Measured status (TPU v5e, M=380, T=120, 16 chains): value/grad agree with
the jnp path to <=4e-3 relative, but XLA's fusion of the jnp path is
already good enough that the kernel is NOT faster (~1.3x slower: the
layout/padding prep runs outside, and the in-kernel Stirling lgamma costs
more ops than XLA's native lgamma).  It is kept as an opt-in backend and a
base for block-sparse MSOA-scale variants where fusion + VMEM residency
will matter; the production path stays jnp.

Pallas TPU does not lower ``lgamma``/``expm1``, so the kernel carries its
own numerics (same accuracy strategy as :mod:`covid19uk_tpu.ops.binomial`):

* ``lgamma(n+1) - lgamma(n-k+1)`` via a shift-by-2 recurrence plus the
  cancellation-free recombined Stirling difference (error < 1e-5 for all
  valid inputs);
* ``lgamma(k+1)`` via shift-by-4 Stirling;
* ``log(1 - exp(-r))`` branch-free via a small-r Taylor switch.

Array layout: time-major ``[T, Mp]`` with the location axis padded to a
multiple of 128 lanes; padded cells carry ``n = y = 0`` and contribute
exactly zero.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from covid19uk_tpu.models.seir import NU

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
RATE_EPS = 1e-9

# log(p_ei) for the constant E->I rate: p = 1 - exp(-NU)
_LOG_P_NU = math.log(-math.expm1(-NU))


def _stirling(z):
    """3-term Stirling: valid to ~3e-6 for z >= 3."""
    inv = 1.0 / z
    return (
        (z - 0.5) * jnp.log(z)
        - z
        + _HALF_LOG_2PI
        + inv * (1.0 / 12.0 - inv * inv * (1.0 / 360.0))
    )


def _log1p(x):
    """log1p without the primitive: exact form for x > 1e-3, Taylor below
    (f32-accurate in both regimes)."""
    big = jnp.log(1.0 + jnp.maximum(x, 1e-3))
    small = x * (1.0 - x * (0.5 - x / 3.0))
    return jnp.where(x > 1e-3, big, small)


def _lgamma_diff(n, k):
    """lgamma(n+1) - lgamma(n-k+1), cancellation-free; valid for
    0 <= k <= n (callers clamp)."""
    b = n - k + 1.0
    A = n + 3.0  # (n+1) + shift 2
    B = b + 2.0  # >= 3
    s_diff = (
        (A - 0.5) * _log1p(k / B)
        + k * jnp.log(B)
        - k
        + (1.0 / 12.0) * (1.0 / A - 1.0 / B)
        - (1.0 / 360.0) * (1.0 / A**3 - 1.0 / B**3)
    )
    return s_diff - _log1p(k / b) - _log1p(k / (b + 1.0))


def _lgamma1p(k):
    """lgamma(k+1) via shift-by-4 Stirling; valid for k >= 0."""
    z = k + 1.0
    return (
        _stirling(z + 4.0)
        - jnp.log(z)
        - jnp.log(z + 1.0)
        - jnp.log(z + 2.0)
        - jnp.log(z + 3.0)
    )


def _log_pm(r):
    """log(1 - exp(-r)) for r > 0, stable at both ends without expm1.

    Three regimes: r <= 1e-2 (Taylor in r), 1e-2 < r <= 5 (direct), r > 5
    (Taylor in e^-r — direct log(1-e^-r) loses 3 digits in f32 there).
    """
    r_safe = jnp.maximum(r, 1e-30)
    em = jnp.exp(-r_safe)
    mid = jnp.log(jnp.maximum(1.0 - em, 1e-30))
    small = jnp.log(r_safe) + jnp.log(
        1.0 - r_safe * (0.5 - r_safe * (1.0 / 6.0 - r_safe / 24.0))
    )
    large = -em * (1.0 + em * (0.5 + em / 3.0))
    return jnp.where(r > 5.0, large, jnp.where(r > 1e-2, mid, small))


def _expm1(r):
    """expm1 for r >= 0 without the primitive (Taylor below 1e-2)."""
    big = jnp.exp(r) - 1.0
    small = r * (1.0 + r * (0.5 + r / 6.0))
    return jnp.where(r > 1e-2, big, small)


def _binom_lp(n, y, log_p, neg_r):
    """Binomial log-pmf given log(p) and log(1-p) = -r; -inf when invalid."""
    valid = (y >= 0.0) & (y <= n) & (n >= 0.0)
    n_ = jnp.where(valid, n, 1.0)
    y_ = jnp.where(valid, y, 0.0)
    lp = (
        _lgamma_diff(n_, y_)
        - _lgamma1p(y_)
        + y_ * log_p
        + (n_ - y_) * neg_r
    )
    return jnp.where(valid, lp, -jnp.inf)


def _fwd_kernel(een_ref, pwn_ref, rir_ref, nse_ref, nei_ref, nir_ref,
                y0_ref, y1_ref, y2_ref, ion_ref, cstart_ref, out_ref):
    ion = ion_ref[:]
    commute = jnp.dot(ion, cstart_ref[:], preferred_element_type=jnp.float32)
    I = nir_ref[:]
    r0 = een_ref[:] * I + pwn_ref[:] * commute + RATE_EPS
    lp0 = _binom_lp(nse_ref[:], y0_ref[:], _log_pm(r0), -r0)
    lp1 = _binom_lp(nei_ref[:], y1_ref[:], _LOG_P_NU, -NU)
    rir = rir_ref[:]
    lp2 = _binom_lp(nir_ref[:], y2_ref[:], _log_pm(rir), -rir)
    out_ref[0, 0] = jnp.sum(lp0 + lp1 + lp2)


def _bwd_kernel(een_ref, pwn_ref, rir_ref, nse_ref, nir_ref,
                y0_ref, y2_ref, ion_ref, cstart_ref,
                g_een_ref, g_pwn_ref, g_rir_ref):
    ion = ion_ref[:]
    commute = jnp.dot(ion, cstart_ref[:], preferred_element_type=jnp.float32)
    I = nir_ref[:]
    r0 = een_ref[:] * I + pwn_ref[:] * commute + RATE_EPS
    # d binom / d r = y * e^-r/(1-e^-r) - (n-y) = y/expm1(r) - (n-y);
    # the expm1 form stays exact for r ~ RATE_EPS where f32 1-e^-r
    # underflows to 0.
    w0 = y0_ref[:] / _expm1(r0) - (nse_ref[:] - y0_ref[:])
    g_een_ref[:] = w0 * I
    g_pwn_ref[:] = w0 * commute
    rir = rir_ref[:]
    g_rir_ref[:] = y2_ref[:] / _expm1(rir) - (nir_ref[:] - y2_ref[:])


def _pad_lanes(x, mp):
    pad = mp - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)))


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def _interpret():
    # Interpret mode on non-TPU backends: the CPU test suite exercises the
    # identical kernel code; on TPU it compiles via Mosaic.
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_loglik(een, pwn, rir, n_se, n_ei, n_ir, y0, y1, y2, ion, cstar_t):
    """Fused SEIR chain-binomial log-likelihood (single chain).

    All tensor args are ``[T, Mp]`` float32 (lane-padded), ``cstar_t`` is
    ``[Mp, Mp]`` (Cstar transposed).  Differentiable w.r.t. the first three
    (parameter-dependent) arguments only.
    """
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=_vmem_specs(11),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(een, pwn, rir, n_se, n_ei, n_ir, y0, y1, y2, ion, cstar_t)
    return out[0, 0]


def _fused_fwd(een, pwn, rir, n_se, n_ei, n_ir, y0, y1, y2, ion, cstar_t):
    value = fused_loglik(
        een, pwn, rir, n_se, n_ei, n_ir, y0, y1, y2, ion, cstar_t
    )
    return value, (een, pwn, rir, n_se, n_ir, y0, y2, ion, cstar_t)


def _fused_bwd(res, g):
    een, pwn, rir, n_se, n_ir, y0, y2, ion, cstar_t = res
    shape = jax.ShapeDtypeStruct(een.shape, een.dtype)
    g_een, g_pwn, g_rir = pl.pallas_call(
        _bwd_kernel,
        out_shape=(shape, shape, shape),
        in_specs=_vmem_specs(9),
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)
        ),
        interpret=_interpret(),
    )(een, pwn, rir, n_se, n_ir, y0, y2, ion, cstar_t)
    zero = lambda x: jnp.zeros_like(x)
    return (
        g * g_een,
        g * g_pwn,
        g * g_rir,
        zero(n_se),
        zero(n_se),
        zero(n_ir),
        zero(y0),
        zero(y0),
        zero(y2),
        zero(ion),
        zero(cstar_t),
    )


fused_loglik.defvjp(_fused_fwd, _fused_bwd)


def chain_binomial_loglik_pallas(model, params, events, state):
    """Evaluates the chain-binomial log-likelihood through the fused kernel.

    Args:
      model: CovidUK.
      params: Parameters (natural space).
      events: ``[M, T, 3]``.
      state: ``[M, T, S]`` (from compute_state).

    Returns:
      scalar log-likelihood, differentiable w.r.t. ``params``.
    """
    from covid19uk_tpu.inference.likelihood import make_context

    d = model.data
    M, T = d.num_locations, model.num_steps
    mp = -(-M // 128) * 128
    ctx = make_context(model, params)

    f32 = jnp.float32

    def prep(x_mt):  # [M, T] -> padded [T, Mp]
        return _pad_lanes(jnp.asarray(x_mt, f32).T, mp)

    een = prep(ctx.exp_eta / d.N[:, None])
    pwn = prep(ctx.exp_eta * (ctx.psi_w[None, :] / d.N[:, None]))
    rir = _pad_lanes(
        jnp.broadcast_to(jnp.asarray(ctx.rate_ir_t, f32)[:, None], (T, M)), mp
    )
    n_se = prep(state[..., 0])
    n_ei = prep(state[..., 1])
    n_ir = prep(state[..., 2])
    y0 = prep(events[..., 0])
    y1 = prep(events[..., 1])
    y2 = prep(events[..., 2])
    ion = prep(state[..., 2] / d.N[:, None])
    cstar_t = jnp.zeros((mp, mp), f32).at[:M, :M].set(
        jnp.asarray(d.Cstar, f32).T
    )
    return fused_loglik(
        een, pwn, rir, n_se, n_ei, n_ir, y0, y1, y2, ion, cstar_t
    )
