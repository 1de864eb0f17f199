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

from covid19uk_tpu.models.spec import ModelData, Parameters, _alpha_timeseries


def next_generation_matrix_fn(data: ModelData, params: Parameters):
    """Returns ``fn(t, state[M, S]) -> ngm [M, M]``.

    Matches the reference's ``next_generation_matrix_fn(covar_data, param)``
    semantics (model_spec.py:302-368), including the t-gather conventions.
    """

    def fn(t, state):
        t = jnp.asarray(t)
        dtype = state.dtype
        M = data.num_locations
        w_t = data.W[jnp.clip(t, 0, data.W.shape[0] - 1)]
        alpha = _alpha_timeseries(params.alpha_0, params.alpha_t, t)
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
