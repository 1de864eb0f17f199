"""Posterior reproduction numbers R_it / R_t from next-generation matrices.

Replaces ``/root/reference/covid19uk/posterior/reproduction_number.py``.
TPU-first: samples x times NGMs evaluate under nested ``vmap`` — XLA fuses
the row-reduction into the NGM build so the dense [M, M] matrix per (s, t)
never round-trips to HBM; the sample-chunk loop (reference CHUNKSIZE=50,
reproduction_number.py:47,63-71) is kept as a host-memory throttle.
"""

import pickle as pkl

import jax
import jax.numpy as jnp
import numpy as np

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.ngm import next_generation_matrix_fn
from covid19uk_tpu.models.spec import ModelData
from covid19uk_tpu.posterior.predict import _params_from_samples
from covid19uk_tpu.utils import ncio

CHUNKSIZE = 50


def calc_posterior_rit(samples, initial_state, times, data: ModelData,
                       dtype=jnp.float32):
    """Per-sample, per-time R_it: row sums of the NGM over destinations.

    Returns ``[S, T, M]`` (reference calc_posterior_rit,
    reproduction_number.py:13-44).
    """
    initial_state = jnp.asarray(initial_state, dtype)
    events = jnp.asarray(samples["seir"], dtype)
    params = _params_from_samples(samples, dtype=dtype)
    times = jnp.asarray(times)

    # data/initial_state/times enter as jit ARGUMENTS, not closed-over
    # device constants: embedding a device array as a compiled constant
    # forces a device->host fetch at trace time (pathological over the
    # remote-TPU tunnel, and bloats the HLO constant pool).
    def r_all(data_, init_, times_, params_, events_):
        def r_one(p, ev):
            state = seir.compute_state(init_, ev)  # [M, T, 4]
            ngm_fn = next_generation_matrix_fn(data_, p)

            def at_t(t):
                ngm = ngm_fn(t, state[:, t, :])
                return jnp.sum(ngm, axis=-2)  # sum over destinations

            return jax.vmap(at_t)(times_)  # [T, M]

        return jax.vmap(r_one)(params_, events_)

    return jax.jit(r_all)(data, initial_state, times, params, events)


def reproduction_number(input_files, output_file):
    """CLI-level R_t computation (reference reproduction_number.py:50-88).

    Writes group ``posterior_predictive`` with R_it [iteration, time,
    location] and the population-weighted R_t [iteration, time].
    """
    covar = ncio.load_group(input_files[0], "constant_data")

    with open(input_files[1], "rb") as f:
        samples = pkl.load(f)
    num_samples = samples["seir"].shape[0]

    initial_state = samples.pop("initial_state")
    # dense-only, no raw C: the NGM reads Cstar; skip the block-sparse
    # build + [M,M] C transfer
    data = ModelData.create(
        covar.variables, jnp.float32, sparse=False, keep_C=False
    )
    times = np.arange(samples["seir"].shape[-2])

    r_its = []
    for start in range(0, num_samples, CHUNKSIZE):
        end = min(start + CHUNKSIZE, num_samples)
        print(f"Chunk {start}:{end}", flush=True)
        sub = {k: v[start:end] for k, v in samples.items()}
        r_its.append(np.asarray(
            calc_posterior_rit(sub, initial_state, times, data)
        ))
    r_it = np.concatenate(r_its, axis=0)  # [S, T, M]

    N = np.squeeze(np.asarray(covar["N"], np.float64))
    weight = N / N.sum()
    r_t = (r_it * weight[None, None, :]).sum(-1)

    out = ncio.Group(
        variables=dict(R_it=r_it, R_t=r_t),
        dims=dict(
            R_it=("iteration", "time", "location"),
            R_t=("iteration", "time"),
        ),
        coords=dict(
            time=covar.coords.get("time", times),
            location=covar.coords.get("location", np.arange(r_it.shape[-1])),
        ),
    )
    ncio.save_group(output_file, "posterior_predictive", out)
    ncio.copy_attrs(input_files[0], output_file)
    return r_it, r_t


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    parser.add_argument(
        "samples", type=str, help="A pickle file with MCMC samples"
    )
    parser.add_argument(
        "-d", "--data", type=str, help="The inferencedata file", required=True
    )
    parser.add_argument(
        "-o", "--output", type=str, help="The output file", required=True
    )
    args = parser.parse_args()

    reproduction_number([args.data, args.samples], args.output)
