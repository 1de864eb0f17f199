"""Within- vs between-location infection-pressure attribution.

Replaces ``/root/reference/covid19uk/posterior/within_between.py``: splits
the infection pressure at the final inference day into within-LAD and
between-LAD components per posterior sample, summarized to CSV.
"""

import pickle as pkl

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import ModelData
from covid19uk_tpu.utils import ncio


def make_within_rate_fns(data: ModelData, psi):
    """Within/between rate functions (reference within_between.py:13-43).

    Note the reference evaluates these at ``t = len(W)`` which clips to the
    final commute volume (within_between.py:51-52) — preserved here.
    """

    def within_fn(t, state):
        w_t = data.W[jnp.clip(t, 0, data.W.shape[0] - 1)]
        rate = state[..., 2] - psi * state[..., 2] / data.N * w_t * jnp.sum(
            data.C, axis=-2
        )
        return rate

    def between_fn(t, state):
        w_t = data.W[jnp.clip(t, 0, data.W.shape[0] - 1)]
        rate = psi * w_t * ((data.C + data.C.T) @ (state[..., 2] / data.N))
        return rate

    return within_fn, between_fn


def calc_pressure_components(data: ModelData, psi, state):
    """Per-sample within/between fractions at one state snapshot
    (reference within_between.py:47-56).

    ``data`` enters the jit as an argument (ModelData is a pytree) — never
    close device arrays into jit constants (remote-tunnel trace-time fetch).
    """
    t_final = data.W.shape[0]

    def all_samples(data_, psi_all, state_all):
        def atomic(psi_, state_):
            within_fn, between_fn = make_within_rate_fns(data_, psi_)
            within = within_fn(t_final, state_)
            between = between_fn(t_final, state_)
            total = within + between
            return within / total, between / total

        return jax.vmap(atomic)(psi_all, state_all)

    return jax.jit(all_samples)(data, psi, state)


def within_between(input_files, output_file):
    """CLI-level PAF summary (reference within_between.py:59-92)."""
    covar = ncio.load_group(input_files[0], "constant_data")
    with open(input_files[1], "rb") as f:
        samples = pkl.load(f)

    # Ambient precision: f64 where x64 is enabled (the CPU test rig, the
    # reference's precision), f32 on the TPU runtime — requesting f64
    # there would silently truncate with a warning per array.
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    data = ModelData.create(covar.variables, dtype, sparse=False)
    psi = jnp.asarray(samples["psi"], dtype)
    events = jnp.asarray(samples["seir"], dtype)
    init_state = jnp.asarray(samples["initial_state"], dtype)

    state = seir.compute_state(init_state, events)
    within, between = calc_pressure_components(data, psi, state[..., -1, :])
    within, between = np.asarray(within), np.asarray(between)

    locations = covar.coords.get(
        "location", np.arange(within.shape[-1]).astype(str)
    )
    df = pd.DataFrame(
        dict(
            within_mean=within.mean(axis=0),
            between_mean=between.mean(axis=0),
            # Divergence from the reference (within_between.py:87): it takes
            # an axis-less mean, broadcasting one global scalar to every
            # location's row.  The per-location posterior probability is the
            # intended quantity — fixed here, documented in PARITY.md.
            p_within_gt_between=np.mean(within > between, axis=0),
        ),
        index=pd.Index(np.asarray(locations).astype(str), name="location"),
    )
    df.to_csv(output_file)
    return df


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    parser.add_argument(
        "-d", "--datafile", type=str, help="Inferencedata file", required=True
    )
    parser.add_argument(
        "-s",
        "--samples",
        type=str,
        help="Posterior samples pickle",
        required=True,
    )
    parser.add_argument("-o", "--output", type=str, help="Output csv")
    args = parser.parse_args()

    within_between([args.datafile, args.samples], args.output)
