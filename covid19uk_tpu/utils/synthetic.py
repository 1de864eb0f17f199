"""Synthetic model/state builders for benchmarks, dry runs, and smoke tests.

Shapes mirror the reference's problem sizes (NI example 11x32, full UK
~380 LADs, MSOA ~7000; SURVEY.md §6).  Commuting flows follow a gravity
model with distance cutoff — uniform random flows at MSOA scale produce
unphysical negative net infection pressure (every location a huge net
exporter), whereas gravity flows are local, bounded, and naturally sparse,
matching the census commuting matrices the reference consumes
(``/root/reference/covid19uk/data/loaders.py`` ``read_mobility``).
"""

import numpy as np


def _pairwise_dist(coords):
    """[M, M] Euclidean distances, allocation-frugal.

    This host only has ONE core and pathologically slow page faults on
    fresh large buffers (~20 s per 200 MB at MSOA scale), so everything
    runs in-place on a single [M, M] float32 buffer.
    """
    c = np.asarray(coords, np.float32)
    sq = (c**2).sum(axis=1)
    d2 = c @ c.T  # the single [M, M] allocation
    d2 *= -2.0
    d2 += sq[:, None]
    d2 += sq[None, :]
    np.maximum(d2, 0.0, out=d2)
    np.sqrt(d2, out=d2)
    return d2


def gravity_flows(rng, N, coords, commute_frac=0.15, radius_frac=0.12):
    """Origin-destination commuting matrix from a gravity model.

    ``C[i, j]`` = number commuting from i to j:
    ``commute_frac * N_i`` workers per origin, distributed over
    destinations within a cutoff radius with weight ``N_j / (d_ij + d0)^2``.
    The cutoff makes the matrix sparse at scale (each area interacts with
    its neighbourhood only), like real census flows.

    Args:
      rng: numpy Generator.
      N: ``[M]`` populations.
      coords: ``[M, 2]`` planar coordinates in [0, 1).
      commute_frac: fraction of each origin's population that commutes.
      radius_frac: cutoff radius as a fraction of the unit box.

    Returns:
      ``[M, M]`` float32 flow matrix with zero diagonal.
    """
    M = N.shape[0]
    w = _pairwise_dist(coords)  # reused in place: d -> weights -> flows
    d0 = 0.2 * radius_frac  # softening: no singularity for near neighbours
    far = w > radius_frac
    w += d0
    np.square(w, out=w)
    np.divide(N[None, :].astype(np.float32), w, out=w)
    w[far] = 0.0
    np.fill_diagonal(w, 0.0)
    row = w.sum(axis=1, dtype=np.float64)  # f64 accumulate, then scale
    scale = np.where(
        row > 0, commute_frac * N / np.maximum(row, 1e-30), 0.0
    ).astype(np.float32)
    w *= scale[:, None]
    return w


def knn_adjacency(coords, k=6):
    """Symmetric k-nearest-neighbour adjacency (every node degree >= k, so
    the CAR precision ``Dw - 0.25 A`` is strictly diagonally dominant)."""
    M = coords.shape[0]
    d = _pairwise_dist(coords)
    np.fill_diagonal(d, np.inf)
    k = min(k, M - 1)
    nn = np.argpartition(d, k, axis=1)[:, :k]
    adjacency = np.zeros((M, M), np.float32)
    rows = np.repeat(np.arange(M), k)
    adjacency[rows, nn.ravel()] = 1.0
    np.maximum(adjacency, adjacency.T, out=adjacency)
    return adjacency


def build_synthetic_model(M, T, dtype, rng_seed=0, sparse="auto",
                          radius_frac=0.12):
    """A CovidUK model over gravity-model covariates at (M locations, T days).

    Args:
      sparse: passed to ``ModelData.create`` — "auto" builds block-sparse
        operators when the matrices are large and sparse enough to pay.
      radius_frac: commuting cutoff radius (fraction of the unit box).
        0.12 suits LAD-scale M (~17 neighbours at M=380); MSOA-scale runs
        should use ~0.05 (0.8% element density at M=7000; the 2011 census
        MSOA matrix is ~6x denser and block-saturated — see
        tools/validate_sparse_gate.py).
    """
    import jax.numpy as jnp

    from covid19uk_tpu.models.spec import CovidUK, ModelData

    rng = np.random.default_rng(rng_seed)
    coords = rng.uniform(0, 1, size=(M, 2))
    N = np.exp(rng.normal(np.log(1.5e5), 0.5, size=M))
    N = np.clip(N, 5e4, 1.2e6)
    C = gravity_flows(rng, N, coords, radius_frac=radius_frac)
    covariates = dict(
        C=C,
        W=np.ones(T),
        N=N,
        adjacency=knn_adjacency(coords),
        weekday=(np.arange(T) % 7 < 5).astype(float),
        area=rng.uniform(1e8, 5e9, size=M),
    )
    data = ModelData.create(covariates, dtype, sparse=sparse)
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
    # jit: eager per-op dispatch over a tunneled TPU is pathologically
    # slow.  The model goes through the jit boundary as a pytree argument:
    # closing over it would bake the [M, M] covariates into the program's
    # constant pool, which the remote-compile tunnel rejects at MSOA scale.
    events = jax.jit(lambda m, k, p: m.sample_seir(k, p))(
        model, jax.random.PRNGKey(7), params
    )
    u = unconstrain_parameters(pack_parameters(params))
    return ChainState(u=u, events=events)
