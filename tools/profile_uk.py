"""UK-scale MCMC step wall profile (VERDICT r03 item 7).

Attributes the full-UK (M=380, T=120, 64-chain) production step's wall to
its components by timing structural variants of the SAME compiled program
in one session (remote-tunnel walls vary ~2x between sessions, so only
same-session ratios are published):

  full       L=16 leapfrogs, 5x multiscan of 4 event kernels, no pairs
             (the bench's TIMED-phase stack)
  L1         1 leapfrog               -> leapfrog marginal cost = (full-L1)/15
  U1         1 multiscan              -> sweep marginal cost = (full-U1)/4
  L1U1       both                     -> fixed residual cross-check
  pairs      full + 1 pair update     -> pair kernel marginal cost
             (the warmup-phase stack)

plus XLA ``cost_analysis`` (FLOPs / bytes accessed) of the compiled full
step for roofline context, and an analytic FLOP count of the one matmul
in the step (the once-per-draw commute ``Cstar @ (I/N)``; the leapfrog
itself is matmul-free by design — the commute/state/lgamma hoists removed
every matmul from the gradient, see gibbs.py:166-177).

Writes the numbers to stdout as JSON; docs/profile_uk.md narrates them.

Usage: python tools/profile_uk.py [--chains 64] [--draws 200]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, T = 380, 120


def main(chains, draws, dtype_name):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference import dual_averaging, welford  # noqa: F401
    from covid19uk_tpu.inference.gibbs import (
        ChainState,
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.models.spec import constrain_parameters, unpack_parameters
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
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
        num_event_time_updates=5, t_range=(T - 21, T), num_pair_updates=0,
    )
    variants = {
        "full": (16, EventKernelConfig(**base)),
        "L1": (1, EventKernelConfig(**base)),
        "U1": (16, EventKernelConfig(**{**base, "num_event_time_updates": 1})),
        "L1U1": (1, EventKernelConfig(**{**base, "num_event_time_updates": 1})),
        "pairs": (16, EventKernelConfig(**{**base, "num_pair_updates": 1})),
    }

    def timed(step, state):
        def run(key, state, tune, model):
            def body(st, k):
                st, _ = step(k, st, tune, model)
                return st, st.u[..., 0]

            keys = jax.random.split(key, draws)
            return jax.lax.scan(body, state, keys)

        run_j = jax.jit(jax.vmap(run, in_axes=(0, 0, 0, None)))

        def force(out):
            return float(jnp.sum(out[1][..., -1]))

        keys = jax.random.split(jax.random.PRNGKey(0), chains)
        out = run_j(keys, state, tune, model)  # compile + settle
        force(out)
        walls = []
        for s in range(3):
            t0 = time.time()
            out = run_j(
                jax.random.split(jax.random.PRNGKey(1 + s), chains),
                state, tune, model,
            )
            force(out)
            walls.append(time.time() - t0)
        per_step_ms = min(walls) / draws * 1e3  # per program step (C chains)
        return per_step_ms, run_j, keys

    results = {}
    cost = None
    for name, (L, cfg) in variants.items():
        step = make_mcmc_step(model, L, cfg)
        ms, run_j, keys = timed(step, state)
        results[name] = round(ms, 3)
        print(f"  {name:6s} {ms:8.3f} ms/step ({chains} chains)",
              file=sys.stderr)
        if name == "full" and cost is None:
            try:
                ca = (
                    run_j.lower(keys, state, tune, model)
                    .compile()
                    .cost_analysis()
                )
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                cost = {
                    "flops": float(ca.get("flops", float("nan"))),
                    "bytes": float(
                        ca.get("bytes accessed", float("nan"))
                    ),
                }
            except Exception as e:  # axon remote backend may not support it
                cost = {"error": repr(e)}

    full, L1, U1, L1U1 = (
        results["full"], results["L1"], results["U1"], results["L1U1"]
    )
    leapfrog_ms = (full - L1) / 15.0  # marginal cost of one leapfrog
    sweep_ms = (full - U1) / 4.0  # marginal cost of one 4-kernel multiscan
    hmc_total = leapfrog_ms * 16
    sweep_total = sweep_ms * 5
    residual = full - hmc_total - sweep_total
    pair_ms = results["pairs"] - full  # 1 pair update per multiscan x5

    # Analytic FLOPs of the step's only matmul (per program step, C chains):
    # commute = Cstar[M,M] @ (I/N)[M,T] once per draw per chain.
    commute_flops = 2.0 * M * M * T * chains

    out = {
        "scale": {"M": M, "T": T, "chains": chains, "draws": draws,
                  "dtype": dtype_name},
        "walls_ms_per_step": results,
        "attribution_ms": {
            "hmc_16_leapfrogs": round(hmc_total, 3),
            "event_sweep_5x4": round(sweep_total, 3),
            "fixed_residual": round(residual, 3),
            "pair_kernel_5x1": round(pair_ms, 3),
            "one_leapfrog": round(leapfrog_ms, 4),
            "one_multiscan": round(sweep_ms, 4),
        },
        "per_transition_us": round(results["full"] / chains * 1e3, 1),
        "xla_cost_analysis_full": cost,
        "commute_matmul_flops_per_step": commute_flops,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--draws", type=int, default=200)
    p.add_argument("--dtype", default="float32", dest="dtype_name")
    main(**vars(p.parse_args()))
