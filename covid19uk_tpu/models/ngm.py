"""Next-generation-matrix computation.

Replaces ``/root/reference/covid19uk/model_spec.py:302-368``.  The NGM at
time t is

    ngm[i, j] = (1 - exp(-rate[i, j])) * S_j * E[infectious period]
    rate[i, j] = exp(eta_i) * (I_{ij} + psi * w_t * Cstar[i,j] / N_j) / N_i
    E[period]  = 1 / (1 - exp(-exp(gamma0)))

(the reference's eta carries a location-row broadcast; note the reference
builds an [M, M] dense matrix — we keep that, it is MXU-friendly and
vmappable over times and posterior samples).
"""

import jax.numpy as jnp

from covid19uk_tpu.models.spec import ModelData, Parameters


def _alpha_timeseries_ngm(alpha_0, alpha_t, t_abs):
    """The NGM's random-walk gather — distinct from the seir rate fn's.

    Reference (model_spec.py:331-343): ``b_t = alpha_0 + cumsum(alpha_t)``;
    at t==0 use alpha_0, else ``b[clip(t, 0, T-2)]`` — note there is NO
    ``t-1`` here, unlike the transition-rate gather (model_spec.py:242-256,
    our :func:`covid19uk_tpu.models.spec._alpha_timeseries`).  The two
    conventions are off by one day for 1 <= t <= T-2; we reproduce each
    faithfully (see PARITY.md "NGM alpha_t gather").
    """
    b = alpha_0 + jnp.cumsum(alpha_t)
    idx = jnp.clip(t_abs, 0, alpha_t.shape[0] - 1)
    return jnp.where(t_abs == 0, alpha_0, b[idx])


def next_generation_matrix_fn(data: ModelData, params: Parameters):
    """Returns ``fn(t, state[M, S]) -> ngm [M, M]``.

    Matches the reference's ``next_generation_matrix_fn(covar_data, param)``
    semantics (model_spec.py:302-368), including its own t-gather convention
    (``b_t[clip(t, 0, T-2)]`` at t>0 — model_spec.py:331-343), which differs
    by one day from the seir rate fn's ``b_t[clip(t-1, ...)]``.
    """

    def fn(t, state):
        t = jnp.asarray(t)
        dtype = state.dtype
        M = data.num_locations
        w_t = data.W[jnp.clip(t, 0, data.W.shape[0] - 1)]
        alpha = _alpha_timeseries_ngm(params.alpha_0, params.alpha_t, t)
        # Reference model_spec.py:346-350: eta = alpha + beta*log_area[:,None]
        # + sigma*spatial — log_area broadcasts over the *destination* axis.
        eta = (
            alpha
            + params.beta_area * data.log_area[:, None]
            + params.sigma_space * params.spatial_effect
        )  # [M, M] after broadcast (rows i, cols j)
        infec_rate = (
            jnp.exp(eta)
            * (
                jnp.eye(M, dtype=dtype)
                + params.psi * w_t * data.Cstar / data.N[None, :]
            )
            / data.N[:, None]
        )
        infec_prob = -jnp.expm1(-infec_rate)
        # Reference model_spec.py:361: S broadcasts over the *row* (dest)
        # axis — state[..., 0][..., newaxis] — despite the docstring's S_j.
        expected_new_infec = infec_prob * state[..., 0][..., :, None]
        expected_infec_period = 1.0 / (-jnp.expm1(-jnp.exp(params.gamma0)))
        return expected_new_infec * expected_infec_period

    return fn
