"""Synthetic model/state builders for benchmarks, dry runs, and smoke tests.

Shapes mirror the reference's problem sizes (NI example 11x32, full UK
~380 LADs; SURVEY.md §6) with random commuting/population covariates and a
chain-adjacency CAR graph.
"""

import numpy as np


def build_synthetic_model(M, T, dtype, rng_seed=0):
    """A CovidUK model over random covariates at (M locations, T days)."""
    import jax.numpy as jnp

    from covid19uk_tpu.models.spec import CovidUK, ModelData

    rng = np.random.default_rng(rng_seed)
    C = rng.uniform(0, 300, size=(M, M))
    np.fill_diagonal(C, 0)
    adjacency = np.zeros((M, M))
    for i in range(M - 1):
        adjacency[i, i + 1] = adjacency[i + 1, i] = 1.0
    covariates = dict(
        C=C,
        W=np.ones(T),
        N=rng.uniform(8e4, 5e5, size=M),
        adjacency=adjacency,
        weekday=(np.arange(T) % 7 < 5).astype(float),
        area=rng.uniform(1e8, 5e9, size=M),
    )
    data = ModelData.create(covariates, dtype)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60.0, np.full(M, 20.0), np.full(M, 40.0), np.zeros(M)], axis=-1
    )
    return CovidUK(data, jnp.asarray(init, dtype), 0, T)


def initial_chain_state(model, rng_seed=0):
    """A valid ChainState: plausible parameters + forward-simulated events."""
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference.gibbs import ChainState
    from covid19uk_tpu.models.spec import (
        Parameters,
        pack_parameters,
        unconstrain_parameters,
    )

    M, T = model.data.num_locations, model.num_steps
    dtype = model.initial_state.dtype
    rng = np.random.default_rng(rng_seed)
    params = Parameters(
        psi=jnp.asarray(0.3, dtype),
        sigma_space=jnp.asarray(0.05, dtype),
        beta_area=jnp.asarray(0.1, dtype),
        gamma0=jnp.asarray(-1.0, dtype),
        gamma1=jnp.asarray(0.05, dtype),
        alpha_0=jnp.asarray(-4.0, dtype),
        alpha_t=jnp.asarray(rng.normal(0, 0.005, T - 1), dtype),
        spatial_effect=jnp.asarray(rng.normal(0, 0.3, M), dtype),
    )
    # jit: eager per-op dispatch over a tunneled TPU is pathologically slow
    events = jax.jit(model.sample_seir)(jax.random.PRNGKey(7), params)
    u = unconstrain_parameters(pack_parameters(params))
    return ChainState(u=u, events=events)
