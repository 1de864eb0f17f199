"""Mixing study: min-scalar ESS/sec vs event-kernel configuration.

The ESS bottleneck is gamma0 (the I->R intercept): its conditional given
the latent infectious path is tight, so gamma0 mixes only as fast as the
E->I event times move.  With windowed delta evaluation the event kernels
are cheap relative to the 16-leapfrog HMC, so spending more proposals per
step (num_event_time_updates / mmax) or tuning the displacement decays can
buy ESS at a small throughput cost.  This tool measures the trade-off.

    python tools/bench_mixing.py [--chains 16] [--scale ni|uk] \
        [--sweeps 5] [--mmax 2] [--move-decay 0.9] [--x-decay 0.9] \
        [--draws 500]

Prints per-scalar ESS, min-ESS/sec, and acceptance rates.
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run(scale, C, sweeps, mmax, move_decay, x_decay, n_draws, warm=300,
        leapfrog=16, seed=0, compensate=True, comp_updates=1, pair_updates=1,
        pair_mmax=1, pair_comp=False, pair_decay=1.0, occult_range="ref",
        pair_updates_sampling=None, gamma_gibbs=False,
        occult_guided="auto", move_guided="never", data_file=None):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference import dual_averaging, welford
    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from covid19uk_tpu.inference.warmup import (
        make_fixed_runner, make_window_runner, regularized_variance,
    )
    from covid19uk_tpu.parallel.diagnostics import effective_sample_size
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model, initial_chain_state,
    )

    if data_file is not None:
        # Real covariates (e.g. data/uk_example/inferencedata.h5): same
        # stack as bench.py build_real — shared production imputation
        # init, scalar jitter for chain diversity.
        from covid19uk_tpu.inference.driver import initialize_from_cases
        from covid19uk_tpu.inference.gibbs import ChainState
        from covid19uk_tpu.models.spec import CovidUK, ModelData
        from covid19uk_tpu.utils import ncio

        constant = ncio.load_group(data_file, "constant_data")
        observations = ncio.load_group(data_file, "observations")
        cases = np.asarray(observations["cases"], np.float64)
        data = ModelData.create(
            constant.variables, jnp.float32, num_chains=C, keep_C=False
        )
        init_state, events = initialize_from_cases(cases, data.N, seed=0)
        M, T = events.shape[:2]
        model = CovidUK(data, jnp.asarray(init_state, jnp.float32), 0, T)
        u0 = jnp.zeros((6 + (T - 1) + M,), jnp.float32)
        single = ChainState(u=u0, events=jnp.asarray(events, jnp.float32))
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (C,) + x.shape), single
        )
        jitter = 0.05 * jax.random.normal(
            jax.random.PRNGKey(7), (C, 6), jnp.float32
        )
        state = state._replace(u=state.u.at[:, :6].add(jitter))
    else:
        M, T = (11, 32) if scale == "ni" else (380, 120)
        model = build_synthetic_model(M, T, jnp.float32)
        single = initial_chain_state(model)
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (C,) + x.shape), single
        )
    t_range = (0, T) if occult_range == "full" else (T - 21, T)
    cfg = EventKernelConfig(
        dmax=84, mmax=mmax, nmax=25, occult_nmax=15,
        num_event_time_updates=sweeps, t_range=t_range,
        move_decay=move_decay, x_decay=x_decay,
        compensate_gamma0=compensate,
        num_compensated_updates=comp_updates,
        num_pair_updates=pair_updates, pair_mmax=pair_mmax,
        pair_move_decay=pair_decay,
        pair_compensate_gamma0=pair_comp,
        gamma_gibbs=gamma_gibbs,
        occult_guided={"auto": "auto", "always": True, "never": False}[
            occult_guided
        ],
        move_guided={"auto": "auto", "always": True, "never": False}[
            move_guided
        ],
    )
    step = make_mcmc_step(model, leapfrog, cfg)
    if pair_updates_sampling is not None:
        step_sample = make_mcmc_step(
            model, leapfrog,
            cfg._replace(num_pair_updates=pair_updates_sampling),
        )
    else:
        step_sample = step

    P = single.u.shape[-1]
    da = jax.vmap(lambda _: dual_averaging.init(0.1, jnp.float32))(
        jnp.arange(C))
    wf = jax.vmap(lambda _: welford.init((P,), jnp.float32))(jnp.arange(C))
    inv_mass = jnp.ones((C, P), jnp.float32)
    # u-only adaptation (no per-draw state trace: a warm-length event
    # trace is [C, warm, M, T, 3] and exhausts HBM at UK scale)
    def warm_run_one(key, st, da, wf, inv_mass_, model_):
        def body(carry, k):
            st, da, wf, im = carry
            tune = HMCTunables(
                step_size=dual_averaging.step_size(da), inv_mass_diag=im
            )
            st, trace = step(k, st, tune, model_)
            acc = jnp.exp(jnp.minimum(trace.hmc.log_accept_ratio, 0.0))
            da = dual_averaging.update(
                da, jnp.where(jnp.isfinite(acc), acc, 0.0)
            )
            wf = welford.update(wf, st.u)
            return (st, da, wf, regularized_variance(wf)), st.u

        keys = jax.random.split(key, warm)
        (st, da, wf, im), us = jax.lax.scan(
            body, (st, da, wf, inv_mass_), keys
        )
        return st, da, us

    warm_run = jax.jit(jax.vmap(warm_run_one, in_axes=(0, 0, 0, 0, 0, None)))
    keys = jax.random.split(jax.random.PRNGKey(42 + seed), C)
    state, da, w_us = warm_run(keys, state, da, wf, inv_mass, model)
    jax.block_until_ready(state.u)
    step_size = dual_averaging.step_size(da)
    inv_mass = jax.vmap(regularized_variance)(
        jax.vmap(welford.from_draws)(w_us))

    # u-only trace: a full-draws event trace is [C, n, M, T, 3] and
    # exhausts HBM at UK scale past ~300 draws (bench.py does the same).
    def fixed_u_only(key, st, step_size_, inv_mass_, model_):
        tune = HMCTunables(step_size=step_size_, inv_mass_diag=inv_mass_)

        def body(s, k):
            s, trace = step_sample(k, s, tune, model_)
            return s, (s.u, trace.hmc.is_accepted,
                       trace.move_se.is_accepted, trace.move_ei.is_accepted,
                       trace.occult_se.is_accepted,
                       trace.occult_ei.is_accepted,
                       trace.comp_ei.is_accepted, trace.pair.is_accepted,
                       trace.gamma.is_accepted)

        keys = jax.random.split(key, n_draws)
        st, out = jax.lax.scan(body, st, keys)
        return st, out

    sample = jax.jit(jax.vmap(fixed_u_only, in_axes=(0, 0, 0, 0, None)))
    def force(x):
        # wall fence via data-dependent host fetch: on axon
        # block_until_ready can return before remote execution completes
        return float(jnp.sum(x[:, -1, :4]))

    keys = jax.random.split(jax.random.PRNGKey(seed), C)
    state, out = sample(keys, state, step_size, inv_mass, model)
    force(out[0])  # compile + burn

    keys = jax.random.split(jax.random.PRNGKey(seed + 1), C)
    t0 = time.time()
    state, out = sample(keys, state, step_size, inv_mass, model)
    force(out[0])
    wall = time.time() - t0

    u = np.asarray(out[0])  # [C, n, P]
    names = ["psi", "sigma_space", "beta_area", "gamma0", "gamma1",
             "alpha_0"]
    ess = {
        name: float(np.asarray(effective_sample_size(
            jnp.asarray(u[:, :, i]))))
        for i, name in enumerate(names)
    }
    acc_names = ["hmc", "move_se", "move_ei", "occ_se", "occ_ei",
                 "comp_ei", "pair", "gamma"]
    acc = {
        name: float(np.asarray(out[1 + i]).mean())
        for i, name in enumerate(acc_names)
    }
    return ess, acc, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--scale", choices=["ni", "uk"], default="ni")
    ap.add_argument("--sweeps", type=int, default=5)
    ap.add_argument("--mmax", type=int, default=2)
    ap.add_argument("--move-decay", type=float, default=0.9)
    ap.add_argument("--x-decay", type=float, default=0.9)
    ap.add_argument("--draws", type=int, default=500)
    ap.add_argument("--warm", type=int, default=300)
    ap.add_argument("--leapfrog", type=int, default=16)
    ap.add_argument("--comp-updates", type=int, default=1)
    ap.add_argument("--pair-updates", type=int, default=1)
    ap.add_argument("--pair-mmax", type=int, default=1)
    ap.add_argument("--no-comp", action="store_true",
                    help="disable the compensated (gamma0, E->I) kernel")
    ap.add_argument("--pair-comp", action="store_true",
                    help="gamma0-compensated pair moves"
                    " (compensated_pair_move_step)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pair-decay", type=float, default=1.0)
    ap.add_argument("--occult-range", choices=["ref", "full"], default="ref",
                    help="occult add/delete t_range: 'ref' = last 21 days "
                    "(reference contract), 'full' = all of [0, T) — same "
                    "invariant distribution, more totals mixing")
    ap.add_argument("--pair-updates-sampling", type=int, default=None,
                    help="pair updates in the TIMED phase (default: same "
                    "as --pair-updates)")
    ap.add_argument("--gamma-gibbs", action="store_true",
                    help="conditional (gamma0, gamma1) | events refresh "
                    "after each sweep (inference/gamma_gibbs.py)")
    ap.add_argument("--occult-guided", choices=["auto", "always", "never"],
                    default="auto",
                    help="guided occult location proposal (fixed "
                    "observed-case weights; gibbs.EventKernelConfig)")
    ap.add_argument("--move-guided", choices=["auto", "always", "never"],
                    default="never",
                    help="guided MOVE/PAIR location proposal (fixed "
                    "observed-case weights over all of [0, T); "
                    "gibbs.EventKernelConfig.move_guided)")
    ap.add_argument("--data", default=None,
                    help="inferencedata.h5 with real covariates (overrides "
                    "--scale's synthetic model)")
    args = ap.parse_args()

    ess, acc, wall = run(
        args.scale, args.chains, args.sweeps, args.mmax,
        args.move_decay, args.x_decay, args.draws, warm=args.warm,
        leapfrog=args.leapfrog,
        compensate=not args.no_comp, comp_updates=args.comp_updates,
        pair_updates=args.pair_updates, pair_mmax=args.pair_mmax,
        pair_comp=args.pair_comp, seed=args.seed,
        pair_decay=args.pair_decay, occult_range=args.occult_range,
        pair_updates_sampling=args.pair_updates_sampling,
        gamma_gibbs=args.gamma_gibbs,
        occult_guided=args.occult_guided, move_guided=args.move_guided,
        data_file=args.data,
    )
    min_ess = min(ess.values())
    argmin = min(ess, key=ess.get)
    scale_label = f"data:{args.data}" if args.data else args.scale
    print(f"config: scale={scale_label} sweeps={args.sweeps} "
          f"comp={not args.no_comp}x{args.comp_updates} "
          f"pair={args.pair_updates} "
          f"mmax={args.mmax} move_decay={args.move_decay} "
          f"x_decay={args.x_decay} leapfrog={args.leapfrog}")
    print("ESS:", {k: round(v, 1) for k, v in ess.items()})
    print("acc:", {k: round(v, 3) for k, v in acc.items()})
    print(
        f"chains={args.chains} draws={args.draws} wall={wall:.1f}s  "
        f"min-ESS/sec={min_ess / wall:.2f} (min: {argmin})  "
        f"draws/sec={args.chains * args.draws / wall:.1f}"
    )


if __name__ == "__main__":
    main()
