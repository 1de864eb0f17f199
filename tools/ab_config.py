"""Same-session A/B of EventKernelConfig knob settings on the UK step.

Times the `full` (TIMED-phase) and `pairs` (warmup-phase) variants of the
production step for a list of config overrides, all in ONE python process
/ TPU tunnel session (CLAUDE.md: only same-session ratios are
trustworthy).  Unlike tools/ab_same_session.py (two source trees), this
compares knob settings of the CURRENT tree — e.g. thread_commute on/off
(docs/profile_uk.md lever a), occult/move guiding, decay settings.

Usage:
  python tools/ab_config.py --arms 'base:{}' \
      'threaded:{"thread_commute": "always"}' [--chains 64] [--draws 200]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

M, T = 380, 120


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arms", nargs="+", required=True,
                   help="name:json-dict of EventKernelConfig overrides")
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--draws", type=int, default=200)
    p.add_argument("--variants", default="full")
    args = p.parse_args()
    variants = args.variants.split(",")

    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference.gibbs import (
        ChainState, EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from covid19uk_tpu.models.spec import (
        constrain_parameters, unpack_parameters,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model, initial_chain_state,
    )

    chains, draws = args.chains, args.draws
    dtype = jnp.float32
    model = build_synthetic_model(M, T, dtype)
    single = initial_chain_state(model)
    ev_keys = jax.random.split(jax.random.PRNGKey(100), chains)
    params_c = unpack_parameters(constrain_parameters(single.u), T, M)
    events = jax.jit(jax.vmap(lambda k: model.sample_seir(k, params_c)))(
        ev_keys
    )
    u = jnp.broadcast_to(single.u, (chains,) + single.u.shape)
    state = ChainState(u=u, events=events)
    P = u.shape[-1]
    tune = HMCTunables(
        step_size=jnp.full((chains,), 0.001, dtype),
        inv_mass_diag=jnp.ones((chains, P), dtype),
    )

    base = dict(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
        num_pair_updates=0,
    )

    def timed(cfg):
        step = make_mcmc_step(model, 16, cfg)

        def run(key, st, tn, mdl):
            def body(s, k):
                s, _ = step(k, s, tn, mdl)
                return s, s.u[..., 0]

            keys = jax.random.split(key, draws)
            return jax.lax.scan(body, st, keys)

        run_j = jax.jit(jax.vmap(run, in_axes=(0, 0, 0, None)))
        keys = jax.random.split(jax.random.PRNGKey(0), chains)
        out = run_j(keys, state, tune, model)
        float(jnp.sum(out[1][..., -1]))
        walls = []
        for s in range(3):
            t0 = time.time()
            out = run_j(
                jax.random.split(jax.random.PRNGKey(1 + s), chains),
                state, tune, model,
            )
            float(jnp.sum(out[1][..., -1]))
            walls.append(time.time() - t0)
        return min(walls) / draws * 1e3

    results = {}
    for arm in args.arms:
        name, _, overrides = arm.partition(":")
        ov = json.loads(overrides or "{}")
        for v in variants:
            d = dict(base)
            d.update(ov)
            if v == "pairs":
                d["num_pair_updates"] = 1
            ms = timed(EventKernelConfig(**d))
            results[f"{name}/{v}"] = round(ms, 3)
            print(f"  {name}/{v}: {ms:.3f} ms/step", file=sys.stderr)

    print(json.dumps({
        "scale": {"M": M, "T": T, "chains": chains, "draws": draws},
        "walls_ms_per_step": results,
    }))


if __name__ == "__main__":
    main()
