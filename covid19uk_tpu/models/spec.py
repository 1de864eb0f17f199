"""CovidUK model: priors + SEIR process as one pure log-density.

Re-designs ``/root/reference/covid19uk/model_spec.py:139-299`` (a TFP
``JointDistributionNamed``) as plain functions over pytrees:

* covariates are pre-processed once into a :class:`ModelData` pytree
  (mean-centred weekday/log-area, Cstar with its diagonal correction, CAR
  precision Cholesky — all host-side, once);
* the transition rates for *all* time steps are computed in one shot —
  the spatial coupling ``Cstar @ (I_t / N)`` for every t is a single
  ``[M, M] @ [M, T]`` matmul that XLA tiles onto the MXU;
* the CAR spatial prior is evaluated in precision form (no matrix inverse,
  no on-device Cholesky), analytically identical to the reference's
  ``MultivariateNormalTriL(scale_tril=cholesky(inv(Dw - 0.25 W)))``
  (``model_spec.py:171-186``).

Parameter vector packing order matches the reference exactly
(``inference/inference.py:285-300, 537-557``):

    [psi, sigma_space, beta_area, gamma0, gamma1, alpha_0,
     alpha_t (T-1), spatial_effect (M)]

with softplus bijection on (psi, sigma_space) (``inference.py:525-535``).
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from covid19uk_tpu.models import seir

_LOG_2PI = math.log(2.0 * math.pi)

# Reference model_spec.py:258-266 adds 1e-9 to the infection rate.
RATE_EPS = 1e-9
# CAR prior autocorrelation parameter (model_spec.py:174).
CAR_RHO = 0.25


class ModelData(NamedTuple):
    """Pre-processed covariates, ready for the device.

    Attributes:
      C: ``[M, M]`` raw commuting matrix (diag zeroed).
      Cstar: ``[M, M]`` symmetrised commuting matrix with diagonal
        ``-colsum(C)`` (model_spec.py:216-219).
      W: ``[Tw]`` daily relative commute volume.
      N: ``[M]`` population sizes.
      weekday: ``[Twd]`` mean-centred weekday indicator (model_spec.py:224-225).
      log_area: ``[M]`` mean-centred log(area / 1e8) (model_spec.py:228-230).
      car_precision: ``[M, M]`` CAR *precision* ``Dw - rho * adjacency``.
        The prior density is the quadratic form ``x' P x`` — identical to the
        reference's ``MultivariateNormalTriL(cholesky(inv(P)))`` but with no
        triangular factor in the hot path (P inherits the adjacency's
        sparsity; the Cholesky would fill in).
      car_logdet: scalar ``log det(precision)`` (precomputed once).
      Cstar_bsr: optional block-sparse (Pallas block-ELL) operator for the
        commuting matrix — built at MSOA scale where the dense [M,M]@[M,T]
        products are HBM-bound on a mostly-zero matrix
        (``ops/pallas/block_sparse.py``); None = use the dense array.
      car_band: optional block-tridiagonal operator for the CAR precision
        (``ops/banded.py``).  The prior evaluates a VECTOR quadratic form
        per leapfrog step, where the 128-lane-padded block-ELL kernel
        wastes 128x MXU work (measured ~5 ms/step of MSOA HMC); the banded
        form is two batched small matmuls.  None = dense quadratic form.
    """

    C: jnp.ndarray
    Cstar: jnp.ndarray
    W: jnp.ndarray
    N: jnp.ndarray
    weekday: jnp.ndarray
    log_area: jnp.ndarray
    car_precision: jnp.ndarray
    car_logdet: jnp.ndarray
    Cstar_bsr: object = None
    car_band: object = None

    @property
    def num_locations(self):
        return self.N.shape[0]

    @classmethod
    def create(cls, covariates, dtype=jnp.float32, sparse="auto",
               keep_C=True, num_chains=1):
        """Builds ModelData from a dict of raw covariate arrays.

        Args:
          covariates: mapping with keys ``C`` [M,M], ``W`` [Tw], ``N`` [M],
            ``adjacency`` [M,M], ``weekday`` [Twd], ``area`` [M] — the
            ``constant_data`` group written by the ETL
            (reference ``model_spec.py:49-105``).
          dtype: device dtype for all arrays.
          sparse: "auto" (default) builds block-sparse operators for
            ``Cstar`` / the CAR precision when M >= 1024, the
            post-reorder 128-block density is <= 0.3, AND the run is
            single-chain (``num_chains`` — batched BSR loses to dense,
            see ``_maybe_block_sparse``); True forces them;
            False disables.
          num_chains: chain count the model will be vmapped over (the
            "auto" batch gate above; ignored for True/False).
          keep_C: keep the raw directed flow matrix on device.  Only the
            within/between attribution uses it; the inference path passes
            False at MSOA scale to skip a [M, M] device transfer.

        When the CAR precision gets a banded operator, the dense
        ``car_precision`` is stored as a [0, 0] placeholder — the prior
        only reads whichever representation is live.
        """
        # Host math in the target precision: this host's page-fault rate
        # makes every fresh [M, M] float64 buffer cost ~20 s at MSOA scale,
        # so float32 models do float32 host prep (with float64 accumulation
        # where a reduction spans M terms).
        hdtype = np.float64 if dtype == jnp.float64 else np.float32
        C = np.array(covariates["C"], hdtype)
        np.fill_diagonal(C, 0.0)
        Cstar = C + C.T
        # reduce_sum(C, axis=-2) in the reference sums over the dest axis,
        # i.e. column sums of C (model_spec.py:219).
        np.fill_diagonal(
            Cstar, -C.sum(axis=-2, dtype=np.float64).astype(hdtype)
        )

        weekday = np.asarray(covariates["weekday"], np.float64)
        weekday = weekday - weekday.mean()

        area = np.asarray(covariates["area"], np.float64)
        log_area = np.log(area / 100000000.0)  # log area in 100 km^2
        log_area = log_area - log_area.mean()

        adjacency = np.asarray(covariates["adjacency"])
        deg = adjacency.sum(axis=-1, dtype=np.float64)
        # precision = Dw - rho * adjacency, built without the dense diag
        precision = np.multiply(adjacency, -CAR_RHO, dtype=hdtype)
        idx = np.arange(precision.shape[0])
        precision[idx, idx] += deg.astype(hdtype)
        car_logdet = _car_log_det(precision)

        Cstar_bsr = _maybe_block_sparse(Cstar, dtype, sparse, num_chains)
        car_band = _maybe_banded(precision, dtype, sparse)

        empty = jnp.zeros((0, 0), dtype)
        return cls(
            C=jnp.asarray(C, dtype) if keep_C else empty,
            Cstar=jnp.asarray(Cstar, dtype),
            W=jnp.asarray(np.squeeze(np.asarray(covariates["W"])), dtype),
            N=jnp.asarray(np.squeeze(np.asarray(covariates["N"])), dtype),
            weekday=jnp.asarray(weekday, dtype),
            log_area=jnp.asarray(log_area, dtype),
            car_precision=(
                empty if car_band is not None
                else jnp.asarray(precision, dtype)
            ),
            car_logdet=jnp.asarray(car_logdet, dtype),
            Cstar_bsr=Cstar_bsr,
            car_band=car_band,
        )


def _maybe_block_sparse(a, dtype, sparse, num_chains=1):
    """Builds a :class:`BlockSparse` operator when it pays (see create)."""
    if sparse is False:
        return None
    M = a.shape[0]
    if sparse == "auto" and M < 1024:
        return None
    if sparse == "auto" and num_chains >= 2:
        # Batched (chain-vmapped) BSR loses to dense at every measured
        # C >= 2: the x-gather traffic scales with nnzb x C while dense
        # batching amortizes the A-read across the batch (v5e tables in
        # tools/bench_block_sparse.py — 0.59x at C=8 on gravity synthetics
        # — and tools/validate_sparse_gate.py — <=0.84x at C in {2,4,8}
        # on real-census-topology flows).  Multi-chain runs route every
        # operator application through the vmap, so skip the build.
        return None
    from covid19uk_tpu.ops.pallas.block_sparse import BlockSparse

    # symmetric by construction (Cstar = C + C', CAR precision) — skip the
    # two-full-matrix-temporary symmetry check
    bsr = BlockSparse.from_dense(a, dtype, check_symmetric=False)
    # Threshold from tools/bench_block_sparse.py on v5e: at 0.16 block
    # density (RCM-reordered, gravity-flow commuting matrices) the kernel
    # beats dense 1.99x single-chain; at 0.36 it only breaks even.  On the
    # raw real-census topology the 128-block density saturates near 1.0
    # (real LAD connectivity is ~86% dense, so nearly every block gets a
    # hit) and this gate correctly rejects the operator — see
    # tools/validate_sparse_gate.py.
    if sparse == "auto" and bsr.block_density > 0.3:
        return None
    return bsr


def _maybe_banded(a, dtype, sparse):
    """Builds a :class:`BandedSym` CAR-precision operator when it pays."""
    if sparse is False:
        return None
    M = a.shape[0]
    if sparse == "auto" and M < 1024:
        return None
    from covid19uk_tpu.ops.banded import BandedSym

    return BandedSym.from_dense(a, dtype)


def _car_log_det(precision):
    """``log det`` of the CAR precision, computed once at model build.

    Small problems use exact float64 LAPACK.  At MSOA scale (M ~ 7000) a
    dense factorization is minutes on this single-core host (and a device
    Cholesky pays a 196 MB tunnel transfer), but the CAR precision is
    adjacency-sparse — a sparse LU with fill-reducing ordering factors the
    whole matrix in well under a second, and ``log det = sum log|U_ii|``
    (the matrix is SPD, so the determinant is positive).
    """
    M = precision.shape[0]
    if M <= 2048:
        L = np.linalg.cholesky(precision)
        return 2.0 * np.sum(np.log(np.diag(L)))
    from scipy.sparse import csc_matrix
    from scipy.sparse.linalg import splu

    lu = splu(csc_matrix(precision))
    logdet = float(
        np.sum(np.log(np.abs(lu.U.diagonal())))
        + np.sum(np.log(np.abs(lu.L.diagonal())))
    )
    return logdet


class Parameters(NamedTuple):
    """Constrained model parameters (natural space)."""

    psi: jnp.ndarray  # commuting infection scaling, > 0
    sigma_space: jnp.ndarray  # CAR effect scale, > 0
    beta_area: jnp.ndarray
    gamma0: jnp.ndarray
    gamma1: jnp.ndarray
    alpha_0: jnp.ndarray
    alpha_t: jnp.ndarray  # [T-1] random-walk increments
    spatial_effect: jnp.ndarray  # [M]


def pack_parameters(params: Parameters) -> jnp.ndarray:
    """Flattens Parameters into the reference's vector order."""
    scalars = jnp.stack(
        [
            params.psi,
            params.sigma_space,
            params.beta_area,
            params.gamma0,
            params.gamma1,
            params.alpha_0,
        ]
    )
    return jnp.concatenate([scalars, params.alpha_t, params.spatial_effect])


def unpack_parameters(flat, num_steps, num_locations) -> Parameters:
    """Inverse of :func:`pack_parameters` (reference inference.py:285-300)."""
    T1 = num_steps - 1
    return Parameters(
        psi=flat[..., 0],
        sigma_space=flat[..., 1],
        beta_area=flat[..., 2],
        gamma0=flat[..., 3],
        gamma1=flat[..., 4],
        alpha_0=flat[..., 5],
        alpha_t=flat[..., 6 : 6 + T1],
        spatial_effect=flat[..., 6 + T1 : 6 + T1 + num_locations],
    )


def constrain_parameters(u):
    """Unconstrained vector -> constrained vector.

    Softplus (with ``low=eps``) on the first two entries (psi, sigma_space),
    identity elsewhere — the inverse of the reference bijector
    ``Invert(Blockwise([Softplus(low=eps), Id, Id, Id]))``
    (inference.py:525-535).
    """
    eps = jnp.finfo(u.dtype).eps
    head = eps + jax.nn.softplus(u[..., :2])
    return jnp.concatenate([head, u[..., 2:]], axis=-1)


def unconstrain_parameters(x):
    """Constrained vector -> unconstrained (inverse softplus on first two)."""
    eps = jnp.finfo(x.dtype).eps
    y = jnp.maximum(x[..., :2] - eps, jnp.finfo(x.dtype).tiny)
    # softplus^{-1}(y) = y + log(-expm1(-y)), stable for both tails
    head = y + jnp.log(-jnp.expm1(-y))
    return jnp.concatenate([head, x[..., 2:]], axis=-1)


def constrain_log_det_jacobian(u):
    """log|det d constrain(u)/du| = sum log sigmoid(u_i) over softplus block."""
    return jnp.sum(jax.nn.log_sigmoid(u[..., :2]), axis=-1)


def _alpha_timeseries(alpha_0, alpha_t, t_abs):
    """Reconstructs the random-walk log-rate at absolute times ``t_abs``.

    Reference (model_spec.py:242-256): ``b_t = alpha_0 + cumsum(alpha_t)``;
    at t==0 use alpha_0, else ``b[clip(t-1, 0, T-2)]``.
    """
    b = alpha_0 + jnp.cumsum(alpha_t)
    idx = jnp.clip(t_abs - 1, 0, alpha_t.shape[0] - 1)
    return jnp.where(t_abs == 0, alpha_0, b[idx])


@jax.tree_util.register_pytree_node_class
class CovidUK:
    """The generative model over ``[M, T, 3]`` event tensors.

    A pure-function analogue of the reference's TFP JointDistributionNamed
    (model_spec.py:139-299).  ``initial_step`` offsets the absolute time
    index used to gather W / weekday / alpha_t, matching the reference's
    clipped gathers (model_spec.py:232-256).

    Registered as a pytree with the step counts as *static* aux data, so a
    model can be passed straight through ``jit``/``vmap`` boundaries as an
    argument — keeping the (potentially hundreds-of-MB at MSOA scale)
    covariate matrices out of the compiled program's constant pool.
    """

    def __init__(self, data, initial_state, initial_step, num_steps):
        self.data = data  # ModelData
        self.initial_state = initial_state  # [M, S]
        self.initial_step = initial_step  # static int
        self.num_steps = num_steps  # static int

    def tree_flatten(self):
        return (self.data, self.initial_state), (
            self.initial_step,
            self.num_steps,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    # ---------- rates ----------

    def commute_pressure(self, infectious):
        """The spatial coupling ``Cstar @ (I/N)`` for all times at once —
        one ``[M,M]@[M,T]`` MXU matmul.

        Parameter-independent: callers evaluating the density repeatedly at
        fixed events (the 16-leapfrog HMC) compute this ONCE and pass it to
        :meth:`transition_rates` — XLA does not hoist a matmul out of the
        leapfrog ``scan`` body, so the manual hoist removes ~17 redundant
        ``[M,M]@[M,T]`` products per HMC step.
        """
        d = self.data
        if d.Cstar_bsr is not None:
            return d.Cstar_bsr.matmul(infectious / d.N[:, None])
        return d.Cstar @ (infectious / d.N[:, None])

    def transition_rates(self, params: Parameters, state, commute=None):
        """Per-transition rates for all times at once.

        Args:
          params: Parameters.
          state: ``[M, T, S]`` state timeseries (from compute_state).
          commute: optional precomputed :meth:`commute_pressure` of
            ``state[..., 2]`` (they must be consistent).

        Returns:
          ``[M, T, X]`` rates (X = 3: S->E, E->I, I->R).
        """
        d = self.data
        dtype = state.dtype
        T = self.num_steps
        t_abs = self.initial_step + jnp.arange(T)

        w_t = d.W[jnp.clip(t_abs, 0, d.W.shape[0] - 1)]  # [T]
        weekday_t = d.weekday[jnp.clip(t_abs, 0, d.weekday.shape[0] - 1)]
        alpha = _alpha_timeseries(params.alpha_0, params.alpha_t, t_abs)  # [T]

        eta = (
            alpha[None, :]
            + params.beta_area * d.log_area[:, None]
            + params.sigma_space * params.spatial_effect[:, None]
        )  # [M, T]

        infectious = state[..., 2]  # [M, T]
        if commute is None:
            commute = self.commute_pressure(infectious)
        rate_se = (
            jnp.exp(eta)
            * (infectious + params.psi * w_t[None, :] * commute)
            / d.N[:, None]
            + RATE_EPS
        )
        rate_ei = jnp.full_like(rate_se, jnp.asarray(seir.NU, dtype))
        rate_ir = jnp.broadcast_to(
            jnp.exp(params.gamma0 + params.gamma1 * weekday_t)[None, :],
            rate_se.shape,
        )
        return jnp.stack([rate_se, rate_ei, rate_ir], axis=-1)

    def reduced_loglik_fn(self, events, state, commute):
        """Chain-binomial log-likelihood for FIXED events, restructured so
        the returned ``params -> scalar`` closure touches only the
        parameter-dependent terms.

        The likelihood cell is ``logC(n, y) + y log p(r) - (n - y) r`` with
        ``p(r) = 1 - exp(-r)``.  With the events (and hence the state) held
        fixed — exactly the HMC leapfrog situation, 17 evaluations per
        transition (reference ``inference.py:537-557``) — three algebraic
        reductions apply:

        * every ``logC(n, y)`` (the lgamma terms) is a constant — hoisted
          into ``const`` once;
        * the E->I rate is the fixed scalar ``NU``, so that *entire* term
          is constant;
        * the I->R rate depends on t only (``exp(gamma0 + gamma1 wd_t)``),
          so its location sum collapses to two precomputed ``[T]``
          reductions.

        What remains per evaluation is the S->E term over ``[M, T]`` (plus
        a ``[T]`` I->R term), with ``exp(eta)`` factored into an
        ``exp[M] x exp[T]`` outer product (M+T transcendentals instead of
        M*T).  Identical value/gradient to summing
        :func:`covid19uk_tpu.ops.binomial.binomial_log_pmf_from_rate` over
        the full rate tensor (tested to fp tolerance).

        Args:
          events: ``[M, T, X]`` fixed event tensor.
          state: ``[M, T, S]`` its state timeseries (compute_state).
          commute: :meth:`commute_pressure` of ``state[..., 2]``.

        Returns:
          ``loglik(params) -> scalar`` closure.
        """
        from covid19uk_tpu.ops.binomial import log_choose

        d = self.data
        dtype = events.dtype
        T = self.num_steps
        tiny = jnp.finfo(dtype).tiny
        nu = jnp.asarray(seir.NU, dtype)

        n = state[..., seir.SOURCE_STATES]  # [M, T, 3]
        y = events
        valid = (y >= 0.0) & (y <= n) & (n >= 0.0)
        lc = jnp.where(
            valid,
            log_choose(jnp.where(valid, n, 1.0), jnp.where(valid, y, 0.0)),
            -jnp.inf,
        )
        log_p_nu = jnp.log(-jnp.expm1(-nu))
        const = (
            jnp.sum(lc)
            + jnp.sum(y[..., 1]) * log_p_nu
            - jnp.sum(n[..., 1] - y[..., 1]) * nu
        )
        sy2 = jnp.sum(y[..., 2], axis=0)  # [T]
        sn2 = jnp.sum(n[..., 2] - y[..., 2], axis=0)  # [T]

        S_, y0 = n[..., 0], y[..., 0]
        infectious = state[..., 2]
        t_abs = self.initial_step + jnp.arange(T)
        w_t = d.W[jnp.clip(t_abs, 0, d.W.shape[0] - 1)]
        weekday_t = d.weekday[jnp.clip(t_abs, 0, d.weekday.shape[0] - 1)]

        def loglik(params: Parameters):
            alpha = _alpha_timeseries(params.alpha_0, params.alpha_t, t_abs)
            e_t = jnp.exp(alpha)  # [T]
            e_m = jnp.exp(
                params.beta_area * d.log_area
                + params.sigma_space * params.spatial_effect
            ) / d.N  # [M]
            pressure = infectious + params.psi * w_t[None, :] * commute
            r_se = jnp.maximum(
                e_m[:, None] * e_t[None, :] * pressure + RATE_EPS, tiny
            )
            se = jnp.sum(
                y0 * jnp.log(-jnp.expm1(-r_se)) - (S_ - y0) * r_se
            )
            r_ir = jnp.maximum(
                jnp.exp(params.gamma0 + params.gamma1 * weekday_t), tiny
            )
            ir = jnp.sum(sy2 * jnp.log(-jnp.expm1(-r_ir)) - sn2 * r_ir)
            return const + se + ir

        return loglik

    def transition_rate_fn(self, params: Parameters):
        """Single-step rate function ``(t, state[M,S]) -> [M, X]``.

        Used by the sequential forward simulation; same math as
        :meth:`transition_rates` restricted to one step.
        """
        d = self.data

        def fn(t, state):
            w_t = d.W[jnp.clip(t, 0, d.W.shape[0] - 1)]
            weekday_t = d.weekday[jnp.clip(t, 0, d.weekday.shape[0] - 1)]
            alpha = _alpha_timeseries(
                params.alpha_0, params.alpha_t, jnp.asarray(t)
            )
            eta = (
                alpha
                + params.beta_area * d.log_area
                + params.sigma_space * params.spatial_effect
            )  # [M]
            infectious = state[..., 2]
            commute = d.Cstar @ (infectious / d.N)
            rate_se = (
                jnp.exp(eta)
                * (infectious + params.psi * w_t * commute)
                / d.N
                + RATE_EPS
            )
            rate_ei = jnp.full_like(rate_se, seir.NU)
            rate_ir = jnp.broadcast_to(
                jnp.exp(params.gamma0 + params.gamma1 * weekday_t),
                rate_se.shape,
            )
            return jnp.stack([rate_se, rate_ei, rate_ir], axis=-1)

        return fn

    # ---------- priors ----------

    def log_prior(self, params: Parameters):
        """Sum of prior log-densities (model_spec.py:140-198)."""
        dtype = params.spatial_effect.dtype

        def normal_lp(x, scale):
            return -0.5 * (_LOG_2PI + 2.0 * math.log(scale)) - 0.5 * (
                x / scale
            ) ** 2

        lp = normal_lp(params.alpha_0, 10.0)
        lp += normal_lp(params.beta_area, 1.0)
        # psi ~ Gamma(concentration=3, rate=10)
        conc, rate = 3.0, 10.0
        psi_safe = jnp.maximum(params.psi, jnp.finfo(dtype).tiny)
        lp += (
            conc * math.log(rate)
            - math.lgamma(conc)
            + (conc - 1.0) * jnp.log(psi_safe)
            - rate * params.psi
        )
        # alpha_t ~ MVN(0, 0.005^2 I_{T-1})
        lp += jnp.sum(normal_lp(params.alpha_t, 0.005))
        # sigma_space ~ HalfNormal(0.1)
        lp += (
            0.5 * math.log(2.0 / math.pi)
            - math.log(0.1)
            - 0.5 * (params.sigma_space / 0.1) ** 2
        )
        # spatial_effect ~ CAR: quadratic form with the (sparse-able)
        # precision — analytically x' L L' x = x' P x, so identical to the
        # reference's MVNTriL(chol(inv(Dw - rho W))) without materializing
        # the (dense, filled-in) Cholesky factor in the HMC gradient path.
        x = params.spatial_effect
        M = self.data.num_locations
        if self.data.car_band is not None:
            quad = self.data.car_band.quad(x)
        else:
            quad = jnp.sum(x * (x @ self.data.car_precision), axis=-1)
        lp += (
            0.5 * self.data.car_logdet
            - 0.5 * M * _LOG_2PI
            - 0.5 * quad
        )
        lp += normal_lp(params.gamma0, 100.0)
        lp += normal_lp(params.gamma1, 100.0)
        return lp

    # ---------- joint density ----------

    def log_prob(self, params: Parameters, events):
        """Joint log-density log p(params, events) — priors + chain binomial."""
        state = seir.compute_state(self.initial_state, events)
        rates = self.transition_rates(params, state)
        ll = seir.chain_binomial_log_prob(
            events, rates, self.initial_state
        )
        return self.log_prior(params) + ll

    def joint_log_prob_unconstrained(self, u, events):
        """log p in the HMC sampling space (reference inference.py:537-557).

        ``u`` is the flat unconstrained parameter vector; adds the
        log-det-Jacobian of the softplus block.
        """
        flat = constrain_parameters(u)
        params = unpack_parameters(
            flat, self.num_steps, self.data.num_locations
        )
        return self.log_prob(params, events) + constrain_log_det_jacobian(u)

    # ---------- simulation ----------

    def sample_seir(self, key, params: Parameters):
        """Forward-simulates an event tensor given parameters."""
        return seir.chain_binomial_sample(
            key,
            self.transition_rate_fn(params),
            self.initial_state,
            self.initial_step,
            self.num_steps,
        )

    def sample_prior_alpha_t(self, key, dtype=jnp.float32):
        """Draws alpha_t from its prior — used by out-of-sample prediction
        (reference posterior/predict.py:40-48 deletes alpha_t so TFP
        re-simulates it)."""
        return 0.005 * jax.random.normal(key, (self.num_steps - 1,), dtype)
