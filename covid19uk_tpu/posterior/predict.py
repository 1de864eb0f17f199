"""Forward prediction from posterior samples.

Replaces ``/root/reference/covid19uk/posterior/predict.py``.  TPU-first
departure: the reference simulates samples *sequentially* with ``tf.map_fn``
(predict.py:66-70) and pins the whole thing to CPU (predict.py:112); here
every posterior sample simulates in parallel under one ``vmap`` — the
per-step [M,M] matvec batches into an MXU matmul across samples.
"""

import pickle as pkl

import jax
import jax.numpy as jnp
import numpy as np

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import CovidUK, ModelData, Parameters
from covid19uk_tpu.utils import ncio


def _params_from_samples(samples, i=None, dtype=jnp.float32):
    get = (lambda k: samples[k]) if i is None else (lambda k: samples[k][i])
    return Parameters(
        psi=jnp.asarray(get("psi"), dtype),
        sigma_space=jnp.asarray(get("sigma_space"), dtype),
        beta_area=jnp.asarray(get("beta_area"), dtype),
        gamma0=jnp.asarray(get("gamma0"), dtype),
        gamma1=jnp.asarray(get("gamma1"), dtype),
        alpha_0=jnp.asarray(get("alpha_0"), dtype),
        alpha_t=jnp.asarray(get("alpha_t"), dtype),
        spatial_effect=jnp.asarray(get("spatial_effect"), dtype),
    )


def predicted_incidence(
    posterior_samples,
    init_state,
    data: ModelData,
    init_step,
    num_steps,
    out_of_sample=False,
    seed=0,
    dtype=jnp.float32,
):
    """Simulates forward from the per-sample state at ``init_step``.

    Args:
      posterior_samples: dict with keys psi, sigma_space, beta_area, gamma0,
        gamma1, alpha_0, alpha_t, spatial_effect, seir — leading sample axis.
      init_state: ``[M, S]`` shared initial state (from the posterior file).
      data: prepared ModelData whose ``weekday`` covers the prediction window.
      init_step: absolute step to start from (non-negative; the CLI resolves
        negative indices, reference predict.py:96-97).
      num_steps: days to simulate.
      out_of_sample: re-base alpha_0 to the trajectory value at
        ``init_step`` and re-simulate alpha_t from its prior
        (reference predict.py:40-48).  Distributionally identical to the
        reference for any ``init_step``: deleting alpha_t there makes TFP
        re-draw it from the *prediction-window* model's prior —
        MVN(0, 0.005^2 I_{num_steps-1}) — which is exactly
        :meth:`CovidUK.sample_prior_alpha_t` here; both then gather the
        walk at clipped absolute time (model_spec.py:242-256), so for
        ``init_step >= num_steps - 1`` the whole window reads the walk's
        endpoint b'[num_steps-2] (a reference quirk, preserved; tested in
        tests/test_predict_details.py).

    Returns:
      (new_init_state [S, M, 4], events [S, M, num_steps, 3])
    """
    num_samples = posterior_samples["seir"].shape[0]
    events_post = jnp.asarray(posterior_samples["seir"], dtype)
    init_state = jnp.asarray(init_state, dtype)

    state = seir.compute_state(init_state, events_post)  # [S, M, T, 4]
    new_init_state = state[..., init_step, :]  # [S, M, 4]

    params = _params_from_samples(posterior_samples, dtype=dtype)

    if out_of_sample:
        alpha_traj = params.alpha_0[:, None] + jnp.cumsum(
            params.alpha_t, axis=-1
        )
        if init_step > 0:
            params = params._replace(alpha_0=alpha_traj[:, init_step - 1])

    keys = jax.random.split(jax.random.PRNGKey(seed), num_samples)

    # data enters the jit as an argument (pytree), never a closed-over
    # device constant (remote-tunnel trace-time fetch; HLO bloat).
    def sim_all(data_, keys_, inits_, params_):
        def sim_one(key, init_, p: Parameters):
            model = CovidUK(data_, init_, init_step, num_steps)
            if out_of_sample:
                key, sub = jax.random.split(key)
                p = p._replace(alpha_t=model.sample_prior_alpha_t(sub, dtype))
            return model.sample_seir(key, p)

        return jax.vmap(sim_one, in_axes=(0, 0, 0))(keys_, inits_, params_)

    events = jax.jit(sim_all)(data, keys, new_init_state, params)
    return new_init_state, events


def read_pkl(filename):
    with open(filename, "rb") as f:
        return pkl.load(f)


def predict(
    data,
    posterior_samples,
    output_file,
    initial_step,
    num_steps,
    out_of_sample=False,
):
    """CLI-level prediction (reference predict.py:80-146).

    Writes group ``predictions`` with events [iteration, location, time,
    event] and initial_state [iteration, location, state].
    """
    covar = ncio.load_group(data, "constant_data")
    obs = ncio.load_group(data, "observations")

    samples = read_pkl(posterior_samples)
    initial_state = samples.pop("initial_state")

    if initial_step < 0:
        initial_step = samples["seir"].shape[-2] + initial_step

    origin_date = np.asarray(obs.coords["time"]).astype("datetime64[D]")[0]
    dates = np.arange(
        origin_date,
        origin_date + np.timedelta64(initial_step + num_steps, "D"),
        np.timedelta64(1, "D"),
    )

    # Extend the weekday covariate over the prediction window
    # (reference predict.py:106-110).  Mon=0..Sun=6; weekday == day-of-week<5.
    covariates = dict(covar.variables)
    dow = (dates.astype("datetime64[D]").view("int64") + 3) % 7  # epoch=Thu
    covariates["weekday"] = (dow < 5).astype(float)
    # dense-only, no raw C: the forward simulation uses the per-step rate
    # fn (dense Cstar); skip the block-sparse build + [M,M] C transfer
    model_data = ModelData.create(
        covariates, jnp.float32, sparse=False, keep_C=False
    )

    estimated_init_state, predicted_events = predicted_incidence(
        samples,
        initial_state,
        model_data,
        initial_step,
        num_steps,
        out_of_sample,
    )

    pred = ncio.Group(
        variables=dict(
            events=np.asarray(predicted_events),
            initial_state=np.asarray(estimated_init_state),
        ),
        dims=dict(
            events=("iteration", "location", "time", "event"),
            initial_state=("iteration", "location", "state"),
        ),
        coords=dict(
            time=dates[initial_step:],
            location=covar.coords.get(
                "location", np.arange(predicted_events.shape[1])
            ),
        ),
    )
    ncio.save_group(output_file, "predictions", pred)
    ncio.copy_attrs(data, output_file)
    return estimated_init_state, predicted_events


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser()
    parser.add_argument(
        "-i", "--initial-step", type=int, default=0, help="Initial step"
    )
    parser.add_argument(
        "-n", "--num-steps", type=int, default=1, help="Number of steps"
    )
    parser.add_argument(
        "-o",
        "--out-of-sample",
        action="store_true",
        help="Out of sample prediction (sample alpha_t)",
    )
    parser.add_argument("data_pkl", type=str, help="Covariate data file")
    parser.add_argument(
        "posterior_samples_pkl", type=str, help="Posterior samples pickle"
    )
    parser.add_argument("output_file", type=str, help="Output file")
    args = parser.parse_args()

    predict(
        args.data_pkl,
        args.posterior_samples_pkl,
        args.output_file,
        args.initial_step,
        args.num_steps,
        args.out_of_sample,
    )
