"""Headline benchmark: min-scalar ESS/sec at full-UK scale, multi-chain.

BASELINE.md's north-star metric is **ESS/sec on the full ~380-LAD UK run,
target >= 50x CPU**.  This benchmark:

1. runs NCHAINS vmapped full MCMC chains (16-leapfrog preconditioned HMC
   over the 505-dim parameter vector + 5x multiscan of 4 event/occult
   kernels over the [380, 120, 3] latent event tensor) on the current
   device — a short on-device adaptation phase, then N_DRAWS timed draws;
2. computes the pooled multi-chain effective sample size of the six scalar
   parameters (Geyer initial-monotone, split chains) and reports
   ``min-scalar ESS / sampling wall seconds``;
3. compares against the *reproducible* CPU ESS/sec baseline: the FROZEN
   naive-v1 sampler (``tools/naive_v1.py`` — full-likelihood re-evaluation
   everywhere, single chain, the TF reference's evaluation strategy, the
   reference's 4-kernel proposal stack) at
   ``ESS-per-draw x naive CPU steps/sec``.  The constant below is measured
   by ``tools/measure_cpu_baseline.py`` and is re-derivable at any commit
   because the naive implementation is vendored and never optimized.
   The timed phase runs the reference's exact 4-kernel proposal stack
   (pair moves run during the untimed warmup only, mirroring the
   production driver's phase split), so the naive chain's ESS-per-draw
   equals this run's by construction and the comparison is exact.
   Setting BENCH_PAIR=1 adds pair moves to the timed phase too; the
   comparison then becomes a conservative lower bound (the CPU chain
   could not achieve that ESS-per-draw).

Single-run min-ESS estimates at this chain length carry ~±30% noise, so
the headline is the **mean over N_SEEDS independent timed segments**
(fresh sampling keys, chains continue from the previous segment's state);
the JSON carries the per-segment spread.

Prints exactly one JSON line:
  {"metric": "ess_per_sec_fulluk", "value": mean, "unit": "min-ESS/sec",
   "vs_baseline": mean_ratio, "sd": sd, "seeds": N_SEEDS,
   "runs": [per-segment values]}

``python bench.py --with-real`` additionally runs the SAME methodology on
the real-census full-UK covariates (`data/uk_example/inferencedata.h5`,
assembled from /root/reference/data/mergedflows.csv +
c2019modagepop.csv by tools/make_uk_inputs.py) and prints a second JSON
line with metric "ess_per_sec_fulluk_real" — same session, so the
synthetic/real ratio is trustworthy (remote-tunnel walls vary ~2x between
sessions).
"""

import json
import os
import sys
import time

import numpy as np

M, T = 380, 120  # full-UK problem scale (SURVEY.md §6)
# Chain count (BENCH_CHAINS overrides; see docs/chain_scaling.md).
NCHAINS = int(os.environ.get("BENCH_CHAINS", "64"))
WARM_DRAWS = 400  # on-device step-size/mass adaptation (not timed)
N_DRAWS = 1000  # timed draws per chain
N_SEEDS = 3  # independent timed segments averaged for the headline

# tools/measure_cpu_baseline.py on this machine (frozen tools/naive_v1.py,
# single chain, M=380, T=120, float32): 0.2452 chain-steps/sec.
CPU_BASELINE_NAIVE_STEPS_PER_SEC = 0.2452


def build(nchains, dtype_name="float32"):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference.gibbs import (
        ChainState,
        EventKernelConfig,
        make_mcmc_step,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    model = build_synthetic_model(M, T, dtype)
    single = initial_chain_state(model)

    # Overdispersed multi-chain init: per-chain latent events simulated
    # independently, scalar parameters jittered — pooled ESS estimates are
    # honest only if chains don't start clumped.
    ev_keys = jax.random.split(jax.random.PRNGKey(100), nchains)
    from covid19uk_tpu.models.spec import unpack_parameters, constrain_parameters
    params_c = unpack_parameters(
        constrain_parameters(single.u), T, M
    )
    events = jax.jit(jax.vmap(lambda k: model.sample_seir(k, params_c)))(
        ev_keys
    )
    jit_key = jax.random.PRNGKey(7)
    jitter = 0.05 * jax.random.normal(jit_key, (nchains, 6), dtype)
    u = jnp.broadcast_to(single.u, (nchains,) + single.u.shape)
    u = u.at[:, :6].add(jitter)
    state = ChainState(u=u, events=events)

    import os

    # Production phase split (driver.run_mcmc): pair moves equilibrate
    # during warmup, sampling bursts run the reference 4-kernel stack.
    # BENCH_PAIR=1 forces pairs in the timed phase too (A/B knob).
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
        num_pair_updates=1,
        # +3% at the bench's C=64 operating point (docs/profile_uk.md
        # lever a); the library "auto" gate can't see the chain count.
        thread_commute="always",
        # Fused Pallas sweep: the whole 4-kernel multiscan as ONE launch
        # per draw (ops/pallas/fused_sweep) — the launch-fusion lever of
        # docs/profile_uk.md, measured same-session at C=64 (tools/
        # bench_fused.py): 13.81 -> 10.97 ms/step (1.26x) on the timed
        # no-pair stack, 20.47 -> 16.73 (1.22x) with pairs, acceptance
        # matching.  BENCH_FUSED=0 opts out (A/B knob).
        fused_sweep=(
            "never" if os.environ.get("BENCH_FUSED") == "0" else "always"
        ),
    )
    step_warm = make_mcmc_step(model, 16, cfg)
    step_sample = make_mcmc_step(
        model, 16,
        cfg._replace(
            num_pair_updates=int(os.environ.get("BENCH_PAIR", "0"))
        ),
    )
    return model, step_warm, step_sample, state


def build_real(nchains, data_file, dtype_name="float32"):
    """Same chain stack over the REAL census full-UK covariates: shared
    seed-0 production imputation init (identical observed I->R slice per
    chain), scalar jitter for chain diversity — warmup diversifies the
    latents."""
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference.driver import initialize_from_cases
    from covid19uk_tpu.inference.gibbs import (
        ChainState,
        EventKernelConfig,
        make_mcmc_step,
    )
    from covid19uk_tpu.models.spec import CovidUK, ModelData
    from covid19uk_tpu.utils import ncio

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    constant = ncio.load_group(data_file, "constant_data")
    observations = ncio.load_group(data_file, "observations")
    cases = np.asarray(observations["cases"], np.float64)
    data = ModelData.create(
        constant.variables, dtype, num_chains=nchains, keep_C=False
    )
    init_state, events = initialize_from_cases(cases, data.N, seed=0)
    Mr, Tr = events.shape[:2]
    model = CovidUK(data, jnp.asarray(init_state, dtype), 0, Tr)

    u0 = jnp.zeros((6 + (Tr - 1) + Mr,), dtype)
    jitter = 0.05 * jax.random.normal(jax.random.PRNGKey(7), (nchains, 6),
                                      dtype)
    u = jnp.broadcast_to(u0, (nchains,) + u0.shape)
    u = u.at[:, :6].add(jitter)
    state = ChainState(
        u=u,
        events=jnp.broadcast_to(
            jnp.asarray(events, dtype), (nchains,) + events.shape
        ),
    )
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(Tr - 21, Tr),
        num_pair_updates=1,
        thread_commute="always",
        fused_sweep=(
            "never" if os.environ.get("BENCH_FUSED") == "0" else "always"
        ),
    )
    step_warm = make_mcmc_step(model, 16, cfg)
    step_sample = make_mcmc_step(
        model, 16, cfg._replace(num_pair_updates=0)
    )
    return model, step_warm, step_sample, state


SCALAR_NAMES = ["psi", "sigma_space", "beta_area", "gamma0", "gamma1",
                "alpha_0"]  # flat packing order (inference.py:285-300)


def run_benchmark(model, step_warm, step_sample, state, metric,
                  warm_draws=WARM_DRAWS):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference import dual_averaging, welford
    from covid19uk_tpu.inference.gibbs import HMCTunables
    from covid19uk_tpu.inference.warmup import regularized_variance
    from covid19uk_tpu.parallel.diagnostics import effective_sample_size
    from covid19uk_tpu.models.spec import constrain_parameters

    C = state.u.shape[0]
    dtype = state.u.dtype
    P = state.u.shape[-1]

    # ---- adaptation (untimed): dual averaging + Welford mass, u-only trace
    # Chunked per device execution: the remote-tunnel backend has failed
    # (UNAVAILABLE) on single executions much longer than ~20 s, and the
    # step wall grows with C — scale the chunk down accordingly.
    WARM_CHUNK = max(100, 500 * 64 // C)

    def warm(key, state, da, wf, inv_mass, model, chunk):
        def body(carry, k):
            state, da, wf, inv_mass = carry
            tune = HMCTunables(
                step_size=dual_averaging.step_size(da),
                inv_mass_diag=inv_mass,
            )
            state, trace = step_warm(k, state, tune, model)
            accept = jnp.exp(jnp.minimum(trace.hmc.log_accept_ratio, 0.0))
            accept = jnp.where(jnp.isfinite(accept), accept, 0.0)
            da = dual_averaging.update(da, accept)
            wf = welford.update(wf, state.u)
            inv_mass = regularized_variance(wf)
            return (state, da, wf, inv_mass), None

        keys = jax.random.split(key, chunk)
        (state, da, wf, inv_mass), _ = jax.lax.scan(
            body, (state, da, wf, inv_mass), keys
        )
        return state, da, wf, inv_mass

    da = jax.vmap(lambda _: dual_averaging.init(0.1, dtype))(jnp.arange(C))
    wf = jax.vmap(lambda _: welford.init((P,), dtype))(jnp.arange(C))
    inv_mass = jnp.ones((C, P), dtype)
    warm_j = jax.jit(
        jax.vmap(warm, in_axes=(0, 0, 0, 0, 0, None, None)),
        static_argnums=6,
    )
    done, wkey = 0, jax.random.PRNGKey(1)
    while done < warm_draws:
        chunk = min(WARM_CHUNK, warm_draws - done)
        wkey, sub = jax.random.split(wkey)
        keys = jax.random.split(sub, C)
        state, da, wf, inv_mass = warm_j(
            keys, state, da, wf, inv_mass, model, chunk
        )
        jax.block_until_ready(state.u)
        done += chunk
    step_size = jax.vmap(dual_averaging.step_size)(da)

    # ---- timed sampling: scalar-only trace (the events stay on device;
    # the six scalars are all the ESS estimator reads, and a full [C,n,P]
    # trace costs this host ~20 s/200 MB in fresh-allocation page faults)
    SEG = max(250, N_DRAWS * 64 // C)  # draws per device execution
    n_segs = max(1, N_DRAWS // SEG)

    def sample(key, state, step_size, inv_mass, model):
        tune = HMCTunables(step_size=step_size, inv_mass_diag=inv_mass)

        def body(state, k):
            state, _ = step_sample(k, state, tune, model)
            return state, state.u[:6]

        keys = jax.random.split(key, SEG)
        state, us = jax.lax.scan(body, state, keys)
        return state, us

    sample_j = jax.jit(jax.vmap(sample, in_axes=(0, 0, 0, 0, None)))

    def force(x):
        # Wall-clock fence via a host fetch of a data-dependent scalar:
        # on the experimental axon backend block_until_ready can return
        # before remote execution completes, silently shrinking walls.
        return float(jnp.sum(x[..., -1, :4]))

    # compile (excluded from timing)
    _, us = sample_j(
        jax.random.split(jax.random.PRNGKey(2), C), state, step_size,
        inv_mass, model,
    )
    force(us)

    # ---- N_SEEDS independent timed segments (multi-seed hygiene: single
    # segments carry ~±30% min-ESS noise; the headline is the mean).
    # Each segment is n_segs consecutive executions of SEG draws (the
    # chain state carries over, so the concatenated series is one
    # continuous chain); the wall sums the executions.
    values, ratios = [], []
    ess_by_scalar = None
    for s in range(N_SEEDS):
        seed_key = jax.random.PRNGKey(3 + s)
        chunks, wall = [], 0.0
        for g in range(n_segs):
            seed_key, sub = jax.random.split(seed_key)
            t0 = time.time()
            state, us = sample_j(
                jax.random.split(sub, C), state, step_size, inv_mass, model,
            )
            force(us)
            wall += time.time() - t0
            chunks.append(np.asarray(us))
        us_all = np.concatenate(chunks, axis=1)  # [C, N_DRAWS, 6]

        # pooled multi-chain ESS of the six scalars (constrained space)
        u_con = np.asarray(constrain_parameters(jnp.asarray(us_all)))
        ess = np.array(
            [
                float(np.asarray(effective_sample_size(
                    jnp.asarray(u_con[:, :, i])
                )))
                for i in range(6)
            ]
        )
        ess_min = float(ess.min())
        ess_by_scalar = {
            n: round(float(e), 1) for n, e in zip(SCALAR_NAMES, ess)
        }
        ess_per_draw = ess_min / (C * N_DRAWS)
        cpu_ess_per_sec = ess_per_draw * CPU_BASELINE_NAIVE_STEPS_PER_SEC
        values.append(ess_min / wall)
        ratios.append(values[-1] / cpu_ess_per_sec)

    return {
        "metric": metric,
        "value": round(float(np.mean(values)), 2),
        "unit": "min-ESS/sec",
        "vs_baseline": round(float(np.mean(ratios)), 2),
        "sd": round(float(np.std(values)), 2),
        "seeds": N_SEEDS,
        "chains": C,
        "runs": [round(v, 2) for v in values],
        # Last segment, per scalar.  Throughput diagnostic ONLY — at the
        # bench's short warmup these are transient-contaminated; mixing
        # measurements need --warm >= 4000 (tools/bench_mixing.py).
        "ess_diag_not_mixing": ess_by_scalar,
    }


def main():
    if "--real-only" not in sys.argv:
        result = run_benchmark(*build(NCHAINS), metric="ess_per_sec_fulluk")
        print(json.dumps(result))
    if "--with-real" in sys.argv or "--real-only" in sys.argv:
        import os

        data_file = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "data/uk_example/inferencedata.h5",
        )
        # The shared imputation init puts real-data chains in the known
        # ~1000-draw person-time transient (docs/calibration.md); 400 warm
        # draws leave the pooled ESS floored at ~num_chains.  Warmup is
        # untimed, so spend enough to measure equilibrium mixing.
        real = run_benchmark(
            *build_real(NCHAINS, data_file),
            metric="ess_per_sec_fulluk_real",
            warm_draws=int(os.environ.get("BENCH_REAL_WARM", "2500")),
        )
        print(json.dumps(real))


if __name__ == "__main__":
    main()
