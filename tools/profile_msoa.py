"""Component-level timing of the MCMC transition at MSOA scale.

Breaks the 'ms/step' number into: full step, HMC-only (16-leapfrog with
hoisted commute), event sweep only (5 multiscans x 4 kernels, windowed
deltas), compute_state, and the commute matvec — to show where the time
goes and which optimization pays next.

Covariates are cached in /tmp (one-time ~4 min host build on this 1-core
box; see CLAUDE.md).

    python tools/profile_msoa.py [M] [T] [radius_frac]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def cached_model(M, T, radius_frac, dtype, sparse="auto", seed=0):
    import jax.numpy as jnp

    from covid19uk_tpu.models.spec import CovidUK, ModelData

    cache = f"/tmp/synth_cov_M{M}_T{T}_r{radius_frac}_s{seed}.npz"
    if os.path.exists(cache):
        cov = dict(np.load(cache))
    else:
        from covid19uk_tpu.utils.synthetic import (
            gravity_flows, knn_adjacency,
        )

        rng = np.random.default_rng(seed)
        coords = rng.uniform(0, 1, size=(M, 2))
        N = np.clip(
            np.exp(rng.normal(np.log(1.5e5), 0.5, size=M)), 5e4, 1.2e6
        )
        cov = dict(
            C=gravity_flows(rng, N, coords, radius_frac=radius_frac),
            W=np.ones(T), N=N, adjacency=knn_adjacency(coords),
            weekday=(np.arange(T) % 7 < 5).astype(float),
            area=rng.uniform(1e8, 5e9, size=M),
        )
        np.savez(cache, **cov)
    data = ModelData.create(cov, dtype, sparse=sparse, keep_C=False)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60.0, np.full(M, 20.0), np.full(M, 40.0), np.zeros(M)], axis=-1
    )
    return CovidUK(data, jnp.asarray(init, dtype), 0, T)


def main(M=7000, T=120, radius_frac=0.05):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference import hmc
    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from covid19uk_tpu.inference.likelihood import (
        WindowedEvaluator, make_context,
    )
    from covid19uk_tpu.inference.event_kernels import (
        event_move_step, occult_step,
    )
    from covid19uk_tpu.models import seir
    from covid19uk_tpu.models.spec import (
        constrain_log_det_jacobian, constrain_parameters, unpack_parameters,
    )
    from covid19uk_tpu.utils.synthetic import initial_chain_state

    t0 = time.time()
    model = cached_model(M, T, radius_frac, jnp.float32)
    bsr = model.data.Cstar_bsr
    print(
        f"model build: {time.time() - t0:.1f}s  Cstar_bsr="
        + (f"density {bsr.block_density:.3f}" if bsr is not None else "no"),
        flush=True,
    )
    state = initial_chain_state(model)
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
    )

    def fence(out):
        # data-dependent scalar fetch: on axon, block_until_ready returns
        # before remote execution completes
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(jnp.ravel(leaf)[:8]))

    def timeit(f, *args, n=20):
        fence(f(*args))
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        fence(out)
        return (time.time() - t0) / n

    key = jax.random.PRNGKey(0)
    tune = HMCTunables(
        step_size=jnp.asarray(0.01, jnp.float32),
        inv_mass_diag=jnp.ones_like(state.u),
    )

    # full step
    step = make_mcmc_step(model, 16, cfg)
    t_full = timeit(
        jax.jit(lambda m, k, s: step(k, s, tune, m)), model, key, state
    )
    print(f"full step:        {t_full * 1e3:8.2f} ms", flush=True)

    # compute_state alone
    f_state = jax.jit(
        lambda m, ev: seir.compute_state(m.initial_state, ev)
    )
    t_state = timeit(f_state, model, state.events)
    print(f"compute_state:    {t_state * 1e3:8.2f} ms", flush=True)

    full_state = f_state(model, state.events)

    # commute matvec alone
    f_comm = jax.jit(lambda m, st: m.commute_pressure(st[..., 2]))
    t_comm = timeit(f_comm, model, full_state)
    print(f"commute matvec:   {t_comm * 1e3:8.2f} ms", flush=True)

    # HMC only (hoisted commute + reduced likelihood, as in gibbs.step)
    def hmc_only(m, k, s):
        fs = seir.compute_state(m.initial_state, s.events)
        commute = m.commute_pressure(fs[..., 2])
        loglik = m.reduced_loglik_fn(s.events, fs, commute)

        def logdensity(u):
            params = unpack_parameters(
                constrain_parameters(u), T, M
            )
            return (
                m.log_prior(params)
                + loglik(params)
                + constrain_log_det_jacobian(u)
            )

        u_new, info = hmc.hmc_step(
            k, s.u, logdensity, tune.step_size, 16, tune.inv_mass_diag
        )
        return u_new, info.target_log_prob

    t_hmc = timeit(jax.jit(hmc_only), model, key, state)
    print(f"hmc only:         {t_hmc * 1e3:8.2f} ms", flush=True)

    # event sweep only (params fixed at current u)
    def sweep_only(m, k, s):
        fs = seir.compute_state(m.initial_state, s.events)
        params = unpack_parameters(constrain_parameters(s.u), T, M)
        ctx = make_context(m, params)
        move_eval = WindowedEvaluator(ctx=ctx, window=min(cfg.dmax + 1, T))
        occ_eval = WindowedEvaluator(ctx=ctx, window=T - cfg.t_range[0])

        def sweep(carry, kk):
            ev, st, lp = carry
            ka, kb, kc, kd = jax.random.split(kk, 4)
            ev, st, lp, _ = event_move_step(
                ka, ev, st, lp, move_eval, 0, cfg.dmax, cfg.mmax, cfg.nmax,
                cfg.move_decay, cfg.x_decay)
            ev, st, lp, _ = event_move_step(
                kb, ev, st, lp, move_eval, 1, cfg.dmax, cfg.mmax, cfg.nmax,
                cfg.move_decay, cfg.x_decay)
            ev, st, lp, _ = occult_step(
                kc, ev, st, lp, occ_eval, 0, cfg.t_range, cfg.occult_nmax,
                cfg.x_decay)
            ev, st, lp, _ = occult_step(
                kd, ev, st, lp, occ_eval, 1, cfg.t_range, cfg.occult_nmax,
                cfg.x_decay)
            return (ev, st, lp), None

        keys = jax.random.split(k, cfg.num_event_time_updates)
        (ev, _, lp), _ = jax.lax.scan(
            sweep, (s.events, fs, jnp.zeros(())), keys
        )
        return ev, lp

    t_sweep = timeit(jax.jit(sweep_only), model, key, state)
    print(f"event sweep only: {t_sweep * 1e3:8.2f} ms", flush=True)
    print(
        f"sum(hmc+sweep):   {(t_hmc + t_sweep) * 1e3:8.2f} ms "
        f"(full={t_full * 1e3:.2f})", flush=True,
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if len(a) > 0 else 7000,
        int(a[1]) if len(a) > 1 else 120,
        float(a[2]) if len(a) > 2 else 0.05,
    )
