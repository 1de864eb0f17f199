"""Secondary benchmark: aggregate ESS/sec on the NI-scale example.

BASELINE.md's north-star metric is ESS/sec for the R0/beta-like posteriors.
This tool runs C chains of the full MCMC (warmup excluded from timing) on a
synthetic NI-scale problem and reports min-scalar-ESS per second aggregated
across chains.  Not wired into the driver's bench.py (which reports raw
transition throughput at full-UK scale); run manually:

    python tools/bench_ess.py [num_chains]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(num_chains=16):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from covid19uk_tpu.inference import dual_averaging, welford
    from covid19uk_tpu.inference.warmup import (
        make_fixed_runner, make_window_runner, regularized_variance,
    )
    from covid19uk_tpu.parallel.diagnostics import effective_sample_size

    M, T = 11, 32  # NI example scale
    C = num_chains
    model = ge._build_model(M, T, jnp.float32)
    single = ge._initial_chain_state(model)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (C,) + x.shape), single
    )
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
    )
    step = make_mcmc_step(model, 16, cfg)
    # adaptive warmup (step size + mass), then timed fixed sampling
    P = single.u.shape[-1]
    da = jax.vmap(lambda _: dual_averaging.init(0.1, jnp.float32))(
        jnp.arange(C))
    wf = jax.vmap(lambda _: welford.init((P,), jnp.float32))(jnp.arange(C))
    inv_mass = jnp.ones((C, P), jnp.float32)
    warm = jax.jit(jax.vmap(make_window_runner(step, 300, adapt_mass=True)))
    keys = jax.random.split(jax.random.PRNGKey(42), C)
    state, da, wf, inv_mass, wdraws, _ = warm(keys, state, da, wf, inv_mass)
    jax.block_until_ready(state)
    tune = HMCTunables(
        step_size=dual_averaging.step_size(da),
        inv_mass_diag=jax.vmap(regularized_variance)(
            jax.vmap(welford.from_draws)(wdraws.u)),
    )

    n_draws = 500
    run = jax.jit(jax.vmap(make_fixed_runner(step, n_draws)))
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    # warm start: run once for compile + burn-in
    state, draws, _ = run(keys, state, tune.step_size, tune.inv_mass_diag)
    # fence via data-dependent fetch: axon's block_until_ready returns early
    float(jnp.sum(draws.u[:, -1, :4]))

    keys = jax.random.split(jax.random.PRNGKey(1), C)
    t0 = time.time()
    state, draws, _ = run(keys, state, tune.step_size, tune.inv_mass_diag)
    float(jnp.sum(draws.u[:, -1, :4]))
    wall = time.time() - t0

    u = np.asarray(draws.u)  # [C, n, P]
    names = ["psi", "sigma_space", "beta_area", "gamma0", "gamma1", "alpha_0"]
    ess = {}
    for i, name in enumerate(names):
        ess[name] = float(np.asarray(
            effective_sample_size(jnp.asarray(u[:, :, i]))
        ))
    min_ess = min(ess.values())
    print({k: round(v, 1) for k, v in ess.items()})
    print(
        f"chains={C} draws={n_draws} wall={wall:.1f}s  "
        f"min-ESS/sec={min_ess / wall:.2f}  "
        f"(draws/sec={C * n_draws / wall:.1f})"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
