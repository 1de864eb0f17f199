"""Top-level MCMC driver: warmup windows, sampling bursts, posterior store.

Replaces ``/root/reference/covid19uk/inference/inference.py:303-608``.
Differences from the reference (all capability supersets):

* **multi-chain by construction**: ``num_chains`` chains run vmapped in one
  XLA program per window/burst; with one chain the output layout matches the
  reference exactly, with several the datasets gain a chain axis.
* **checkpoint/resume**: full sampler state serialized per burst
  (the reference loses the whole run on preemption, SURVEY.md §5).
* adaptation runs inside the jitted window scan — no host round-trip per
  draw, only per window/burst.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from covid19uk_tpu.config import McmcConfig
from covid19uk_tpu.utils.logging import RunLog

from covid19uk_tpu.models import seir
from covid19uk_tpu.models.spec import (
    CovidUK,
    ModelData,
    constrain_parameters,
)
from covid19uk_tpu.inference import dual_averaging, welford
from covid19uk_tpu.inference.gibbs import (
    ChainState,
    EventKernelConfig,
    make_mcmc_step,
)
from covid19uk_tpu.inference.warmup import (
    WarmupSchedule,
    make_fixed_runner,
    make_window_runner,
)
from covid19uk_tpu.utils import checkpoint as ckpt
from covid19uk_tpu.utils import impute, ncio
from covid19uk_tpu.utils.store import Posterior

NUM_LEAPFROG_STEPS = 16  # reference inference.py:326
INITIAL_STEP_SIZE = 0.1  # reference inference.py:325


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def draws_to_dict(u_constrained, events, num_steps, num_locations):
    """Splits flat constrained parameter draws into the reference's named
    sample layout (inference.py:285-300)."""
    T1 = num_steps - 1
    return {
        "psi": u_constrained[..., 0],
        "sigma_space": u_constrained[..., 1],
        "beta_area": u_constrained[..., 2],
        "gamma0": u_constrained[..., 3],
        "gamma1": u_constrained[..., 4],
        "alpha_0": u_constrained[..., 5],
        "alpha_t": u_constrained[..., 6 : 6 + T1],
        "spatial_effect": u_constrained[..., 6 + T1 : 6 + T1 + num_locations],
        "seir": events,
    }


def pool_adaptation(step_size, wf):
    """Cross-chain pooled adaptation at window granularity: all chains share
    the geometric-mean step size and the moment-pooled mass matrix — the
    multi-chain upgrade of the reference's single-chain RunningVariance
    (inference.py:36-47).

    The pooled variance is the population variance of the concatenated
    chains' draws (law of total variance): mean within-chain variance plus
    the between-chain variance of the means.  Exact when every chain's
    accumulator holds the same count (the driver's windows guarantee this).

    Args:
      step_size: ``[C]`` per-chain step sizes.
      wf: chain-batched :class:`welford.RunningVariance` (leading axis C).

    Returns:
      (step_size, wf) with identical pooled values broadcast to every chain.
    """
    C = step_size.shape[0]
    step_size = jnp.broadcast_to(
        jnp.exp(jnp.mean(jnp.log(step_size))), step_size.shape
    )
    count = jnp.mean(wf.count) * C
    mean = jnp.mean(wf.mean, axis=0)
    var = jnp.mean(jax.vmap(welford.variance)(wf), axis=0) + jnp.var(
        wf.mean, axis=0
    )
    pooled = welford.from_stats(count, mean, var)
    wf = jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape), pooled)
    return step_size, wf


def _move_results(info, per_location):
    """Mirrors the reference's per-kernel results (inference.py:262-274).

    ``per_location``: move kernels carry an [mmax] payload per draw (stack
    the 4 fields one axis in); occult kernels carry scalars (stack at -1).
    """
    fields = [
        np.asarray(info.m),
        np.asarray(info.t),
        np.asarray(info.delta_t),
        np.asarray(info.x_star),
    ]
    return {
        "is_accepted": np.asarray(info.is_accepted),
        "target_log_prob": np.asarray(info.target_log_prob),
        "proposed_delta": np.stack(fields, axis=-2 if per_location else -1),
    }


def trace_to_results(traces, squeeze_chain):
    """StepTrace pytree (stacked over draws [, chains]) -> nested dict."""

    def fix(x):
        x = np.asarray(x)
        if squeeze_chain:
            x = x[:, 0] if x.ndim > 1 else x
        return x

    traces = jax.tree.map(fix, traces)
    return {
        "hmc": {
            "is_accepted": np.asarray(traces.hmc.is_accepted),
            "target_log_prob": np.asarray(traces.hmc.target_log_prob),
            "step_size": np.asarray(traces.hmc.step_size),
        },
        "move/S->E": _move_results(traces.move_se, per_location=True),
        "move/E->I": _move_results(traces.move_ei, per_location=True),
        "occult/S->E": _move_results(traces.occult_se, per_location=False),
        "occult/E->I": _move_results(traces.occult_ei, per_location=False),
        # Framework extensions (additive to the reference layout): the
        # joint (gamma0, E->I) ridge-move kernel and the episode-
        # translation pair-move kernel.
        "move/E->I_compensated": _move_results(
            traces.comp_ei, per_location=True
        ),
        "move/S->E+E->I_pair": _move_results(traces.pair, per_location=True),
        "gamma": {
            "is_accepted": np.asarray(traces.gamma.is_accepted),
            "log_accept_ratio": np.asarray(traces.gamma.log_accept_ratio),
        },
    }


def run_mcmc(
    model: CovidUK,
    initial_chain_state: ChainState,
    event_config: EventKernelConfig,
    config,
    output_file,
    num_chains=1,
    seed=1,
    schedule=None,
    checkpoint_path=None,
):
    """Runs warmup + bursts, writing every draw to the posterior file.

    Args:
      model: CovidUK model.
      initial_chain_state: single-chain ChainState (replicated over chains).
      event_config: event-kernel knobs with t_range set.
      config: dict with num_bursts / num_burst_samples / thin.
      output_file: posterior HDF5 path.
      num_chains: chains run in one vmapped program.
      seed: PRNG seed.
      schedule: WarmupSchedule (reference defaults if None).
      checkpoint_path: optional path for burst-granular resume.

    Returns:
      the Posterior store (open).
    """
    if isinstance(config, dict):
        config = McmcConfig.from_dict(config)
    schedule = schedule or (
        WarmupSchedule(**config.warmup) if config.warmup else WarmupSchedule()
    )
    log = RunLog(config.log_file)
    C = num_chains
    dtype = initial_chain_state.u.dtype
    T, M = model.num_steps, model.data.num_locations
    P = initial_chain_state.u.shape[-1]

    # Phase-split kernel stacks: the episode-translation pair moves exist
    # to equilibrate the slow infectious-person-time mode, which is a
    # *warmup* concern — at equilibrium they are ESS-neutral per draw and
    # cost ~30% wall at full-UK scale (README 'Benchmarks').  Warmup
    # windows run with the configured num_pair_updates; sampling bursts
    # run with num_pair_updates_sampling (default 0).  Both stacks leave
    # the same distribution invariant, so mixing phases is exact.
    step = make_mcmc_step(model, NUM_LEAPFROG_STEPS, event_config)
    sampling_pairs = getattr(config, "num_pair_updates_sampling", 0)
    step_sample = make_mcmc_step(
        model,
        NUM_LEAPFROG_STEPS,
        event_config._replace(num_pair_updates=sampling_pairs),
    )

    # Replicate the single-chain init over the chain axis.
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (C,) + x.shape), initial_chain_state
    )
    key = jax.random.PRNGKey(seed)

    # Mesh sharding: placing the inputs is all it takes — jit propagates
    # the shardings through the windows/bursts.  The chain axis is pure
    # data parallelism (zero collectives in the transition); with
    # space_devices > 1 the event tensor's location axis and the commuting
    # matmul are additionally model-parallel over the `space` axis (XLA
    # inserts the psum/all-gathers from the annotations alone).
    shard = lambda x: x
    shard_state = lambda s: s
    if config.use_mesh and jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from covid19uk_tpu.parallel.mesh import chain_mesh, chain_space_mesh

        n_dev = jax.device_count()
        space = config.space_devices
        if n_dev % space != 0:
            raise ValueError(
                f"space_devices={space} must divide device count {n_dev}"
            )
        chain_dev = n_dev // space
        if C % chain_dev != 0:
            raise ValueError(
                f"num_chains={C} must be a multiple of the chain-axis "
                f"device count {chain_dev} when use_mesh is set"
            )
        if space > 1:
            if M % space != 0:
                raise ValueError(
                    f"num_locations={M} must be a multiple of "
                    f"space_devices={space}"
                )
            mesh = chain_space_mesh(n_dev, space=space)

            # The Pallas block-sparse operators carry a custom_partitioning
            # rule (ops/pallas/block_sparse.py): sharding their block-row
            # axis over `space` runs each device's row band locally with x
            # all-gathered, so space sharding KEEPS the sparse path.  If
            # the row count doesn't divide, the operator stays replicated
            # (correct, just not model-parallel).  The dense Cstar remains
            # column-sharded for the evaluator's row/column gathers and
            # the dense fallback.
            def shard_bsr(bsr):
                if bsr is None:
                    return None
                if bsr.col_idx.shape[0] % space != 0:
                    return bsr
                return type(bsr)(
                    jax.device_put(
                        bsr.values,
                        NamedSharding(
                            mesh, PartitionSpec("space", None, None, None)
                        ),
                    ),
                    jax.device_put(
                        bsr.col_idx,
                        NamedSharding(mesh, PartitionSpec("space", None)),
                    ),
                    bsr.n,
                    bsr.perm,
                    bsr.inv_perm,
                )

            data = model.data._replace(
                Cstar_bsr=shard_bsr(model.data.Cstar_bsr),
                # car_band (CAR prior) stays replicated: its batched small
                # matmuls are ~MFLOP-scale — not worth partitioning
                Cstar=jax.device_put(
                    model.data.Cstar,
                    NamedSharding(mesh, PartitionSpec(None, "space")),
                ),
            )
            model = CovidUK(
                data, model.initial_state, model.initial_step,
                model.num_steps,
            )
        else:
            mesh = chain_mesh(n_dev)

        def shard(x):
            spec = PartitionSpec("chain", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        def shard_state(s):
            ev_spec = PartitionSpec(
                "chain", "space" if space > 1 else None, None, None
            )
            return ChainState(
                u=shard(s.u),
                events=jax.device_put(
                    s.events, NamedSharding(mesh, ev_spec)
                ),
            )

        state = shard_state(state)
        _log(
            f"Sharding {C} chains over {chain_dev} devices"
            + (f" x {space} space devices" if space > 1 else "")
        )

    squeeze = C == 1

    def to_samples(draws):
        u_con = constrain_parameters(draws.u)  # [n, C, P]
        u_np, ev_np = np.asarray(u_con), np.asarray(draws.events)
        if squeeze:
            u_np, ev_np = u_np[:, 0], ev_np[:, 0]
        return draws_to_dict(u_np, ev_np, T, M)

    # ---- resume? ---------------------------------------------------------
    resuming = checkpoint_path is not None and ckpt.exists(checkpoint_path)

    # ---- posterior store (preallocate via shape templates) --------------
    # Sampling-phase draws are stored every `thin`-th (warmup windows are
    # written in full); the reference carries the same Mcmc knob
    # (example_config.yaml:32).  Long runs (50k+ draws) would otherwise
    # write hundreds of GB of event tensors.
    thin = config.thin
    if config.num_burst_samples % thin != 0:
        raise ValueError(
            f"num_burst_samples={config.num_burst_samples} must be a "
            f"multiple of thin={thin}"
        )
    stored_per_burst = config.num_burst_samples // thin
    # Warmup draws are written in full when store_warmup (reference
    # behavior); at MSOA scale they dominate the store and the write wall,
    # so production configs there disable them.
    warmup_stored = schedule.total if config.store_warmup else 0
    num_samples = warmup_stored + stored_per_burst * config.num_bursts
    chain_shape = () if squeeze else (C,)
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    sample_template = draws_to_dict(
        np.zeros((1,) + chain_shape + (P,), np_dtype),
        np.zeros((1,) + chain_shape + (M, T, 3), np_dtype),
        T,
        M,
    )
    move_t = {
        "is_accepted": np.zeros((1,) + chain_shape, bool),
        "target_log_prob": np.zeros((1,) + chain_shape, np_dtype),
        "proposed_delta": np.zeros(
            (1,) + chain_shape + (4, event_config.mmax), np_dtype
        ),
    }
    occ_t = {
        "is_accepted": np.zeros((1,) + chain_shape, bool),
        "target_log_prob": np.zeros((1,) + chain_shape, np_dtype),
        "proposed_delta": np.zeros((1,) + chain_shape + (4,), np_dtype),
    }
    def loc_move_t(mmax):
        return {
            "is_accepted": np.zeros((1,) + chain_shape, bool),
            "target_log_prob": np.zeros((1,) + chain_shape, np_dtype),
            "proposed_delta": np.zeros(
                (1,) + chain_shape + (4, mmax), np_dtype
            ),
        }

    results_template = {
        "hmc": {
            "is_accepted": np.zeros((1,) + chain_shape, bool),
            "target_log_prob": np.zeros((1,) + chain_shape, np_dtype),
            "step_size": np.zeros((1,) + chain_shape, np_dtype),
        },
        "move/S->E": move_t,
        "move/E->I": dict(move_t),
        "occult/S->E": occ_t,
        "occult/E->I": dict(occ_t),
        # framework extensions (trace_to_results writes these too)
        "move/E->I_compensated": dict(move_t),
        "move/S->E+E->I_pair": loc_move_t(event_config.pair_mmax),
        "gamma": {
            "is_accepted": np.zeros((1,) + chain_shape, bool),
            "log_accept_ratio": np.zeros((1,) + chain_shape, np_dtype),
        },
    }
    if resuming:
        # Never truncate an existing run: reopen and append past the
        # checkpointed offset (the reference loses the whole run here).
        posterior = Posterior.open(
            output_file, sample_template, results_template
        )
    else:
        posterior = Posterior(
            output_file, sample_template, results_template, num_samples
        )
    offset = 0

    # ---- adaptation state ------------------------------------------------
    da = jax.vmap(lambda _: dual_averaging.init(INITIAL_STEP_SIZE, dtype))(
        jnp.arange(C)
    )
    wf = jax.vmap(lambda _: welford.init((P,), dtype))(jnp.arange(C))
    inv_mass = shard(jnp.ones((C, P), dtype))
    da = jax.tree.map(shard, da)
    wf = jax.tree.map(shard, wf)

    # ---- Robbins–Monro acceptance autotuning of the move decays ----------
    # Each move kernel's displacement decay AND event-count (x) decay are
    # retuned between warmup windows toward config.move_accept_target (the
    # reference's ~23% manual target, tex:325-326), then frozen for
    # sampling.  Decays are traced scalars through the jit boundary, so
    # retuning never recompiles.  Both knobs raise acceptance when
    # lowered; which one binds is scale-dependent — at UK scale the
    # displacement decay has measured slope ~ -1.6 acceptance per
    # log-decay unit, while at NI scale it is flat (round-5 telemetry:
    # decays marched 0.85 -> 0.50 with acceptance pinned at 0.12-0.16)
    # and the event-count decay does the work.  The same error signal
    # drives both at half the single-knob gain, so the joint response
    # stays inside the stability region gain*|slope| < 2.
    autotune = bool(getattr(config, "autotune_acceptance", False))
    accept_target = float(getattr(config, "move_accept_target", 0.23))
    # x-knob participation is scale-gated (config.autotune_x): at NI
    # scale it is the binding knob (band reached, gamma0 ESS 3.4x); at
    # UK scale forcing the band via x shrinks moves and costs ESS.
    _ax = getattr(config, "autotune_x", "auto")
    autotune_x = (
        model.data.num_locations < 64 if _ax == "auto" else _ax == "always"
    )
    # Single-knob gain 0.8 (r4 stability analysis); halved when the x
    # knob joins so the joint response stays inside gain*|slope| < 2.
    _RM_GAIN = 0.4 if autotune_x else 0.8
    # [move_decay_se, move_decay_ei, x_decay_se, x_decay_ei] in log space
    log_decays = [float(np.log(config.move_decay))] * 2 + [
        float(np.log(config.x_decay))
    ] * 2
    decays = (
        tuple(jnp.asarray(np.exp(ld), dtype) for ld in log_decays)
        if autotune
        else None
    )

    def update_decays(traces):
        nonlocal decays, log_decays
        if not autotune:
            return
        for i, tr in enumerate((traces.move_se, traces.move_ei)):
            acc = float(np.asarray(tr.is_accepted).mean())
            delta = float(np.clip(_RM_GAIN * (acc - accept_target), -0.5, 0.5))
            knobs = (i, i + 2) if autotune_x else (i,)
            for j in knobs:  # displacement (+ event-count when gated on)
                log_decays[j] = float(
                    np.clip(
                        log_decays[j] + delta,
                        np.log(0.05), np.log(0.999999),
                    )
                )
        decays = tuple(jnp.asarray(np.exp(ld), dtype) for ld in log_decays)

    def window(num_draws, adapt_mass):
        run = make_window_runner(step, num_draws, adapt_mass)
        # model passed as an (unmapped) argument so covariates are program
        # inputs rather than multi-MB compiled constants
        if autotune:
            jitted = jax.jit(
                jax.vmap(run, in_axes=(0, 0, 0, 0, 0, None, None))
            )
            return lambda *args: jitted(*args, decays)
        return jax.jit(jax.vmap(run, in_axes=(0, 0, 0, 0, 0, None)))

    def write_at(draws, traces, off):
        # draws come chain-major from vmap: [C, n, ...] -> [n, C, ...]
        draws = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), draws)
        traces = jax.tree.map(
            lambda x: np.swapaxes(np.asarray(x), 0, 1), traces
        )
        posterior.write_samples(to_samples(draws), first_dim_offset=off)
        posterior.write_results(
            trace_to_results(traces, squeeze), first_dim_offset=off
        )
        return off + np.asarray(draws.u).shape[0]

    def write(draws, traces):
        # warmup-window writes route through here; bursts use write_at
        # directly (async).  No-op when warmup storage is disabled.
        nonlocal offset
        if config.store_warmup:
            offset = write_at(draws, traces, offset)

    def pool(step_size, wf):
        if not config.pooled_adaptation or C == 1:
            return step_size, wf
        return pool_adaptation(step_size, wf)

    def log_window(name, n, traces, timer):
        acc = float(np.asarray(traces.hmc.is_accepted).mean())
        extra = {}
        if autotune:
            extra = dict(
                move_se_accept=round(
                    float(np.asarray(traces.move_se.is_accepted).mean()), 4
                ),
                move_ei_accept=round(
                    float(np.asarray(traces.move_ei.is_accepted).mean()), 4
                ),
                move_decay_se=round(float(np.exp(log_decays[0])), 4),
                move_decay_ei=round(float(np.exp(log_decays[1])), 4),
                x_decay_se=round(float(np.exp(log_decays[2])), 4),
                x_decay_ei=round(float(np.exp(log_decays[3])), 4),
            )
        log.event(
            "window", name=name, draws=n,
            hmc_accept=round(acc, 4),
            step_size=float(np.mean(np.asarray(traces.hmc.step_size)[:, -1])),
            draws_per_sec=round(n * C / max(timer, 1e-9), 2),
            **extra,
        )

    if resuming:
        # Warmup already ran in the interrupted run; restore everything.
        state, key, step_size, inv_mass, offset, extra = ckpt.load(
            checkpoint_path, state
        )
        state = shard_state(jax.tree.map(jnp.asarray, state))
        key, step_size, inv_mass = (
            jnp.asarray(key),
            jnp.asarray(step_size),
            jnp.asarray(inv_mass),
        )
        offset = int(offset)
        start_burst = int(extra.get("burst", 0))
        if autotune and "log_decays" in extra:
            restored = [float(v) for v in extra["log_decays"]]
            if len(restored) == 2:
                # pre-round-5 checkpoint: x decays stay at config
                restored += [float(np.log(config.x_decay))] * 2
            log_decays = restored
            decays = tuple(
                jnp.asarray(np.exp(ld), dtype) for ld in log_decays
            )
        _log(f"Resumed from checkpoint at burst {start_burst}")
    else:
        start_burst = 0

        # ---- fast window ---------------------------------------------------
        _log(f"Fast window {schedule.first_window}")
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, da, wf, inv_mass, draws, traces = window(
            schedule.first_window, adapt_mass=False
        )(shard(jax.random.split(sub, C)), state, da, wf, inv_mass, model)
        jax.block_until_ready(state)
        update_decays(traces)
        log_window("fast", schedule.first_window, traces, time.time() - t0)
        write(draws, traces)
        step_size = dual_averaging.step_size(da)
        # draws.u is chain-major [C, n, P]; seed Welford per chain from the
        # window's last half (reference inference.py:36-47,119).
        wf = jax.vmap(welford.from_draws)(draws.u)
        step_size, wf = pool(step_size, wf)
        from covid19uk_tpu.inference.warmup import regularized_variance

        inv_mass = jax.vmap(regularized_variance)(wf)

        # ---- slow windows ---------------------------------------------------
        for k in range(schedule.num_slow_windows):
            n = schedule.slow_window * (2**k)
            _log(f"Slow window {n}")
            key, sub = jax.random.split(key)
            da = jax.vmap(lambda s: dual_averaging.init(s, dtype))(step_size)
            t0 = time.time()
            state, da, wf, inv_mass, draws, traces = window(
                n, adapt_mass=True
            )(shard(jax.random.split(sub, C)), state, da, wf, inv_mass, model)
            jax.block_until_ready(state)
            update_decays(traces)
            log_window("slow", n, traces, time.time() - t0)
            write(draws, traces)
            step_size = dual_averaging.step_size(da)
            wf = jax.vmap(welford.from_draws)(draws.u)
            step_size, wf = pool(step_size, wf)

        # ---- final fast window ----------------------------------------------
        _log(f"Fast window {schedule.last_window}")
        key, sub = jax.random.split(key)
        da = jax.vmap(lambda s: dual_averaging.init(s, dtype))(step_size)
        t0 = time.time()
        state, da, wf_unused, inv_mass, draws, traces = window(
            schedule.last_window, adapt_mass=False
        )(shard(jax.random.split(sub, C)), state, da, wf, inv_mass, model)
        jax.block_until_ready(state)
        log_window("fast", schedule.last_window, traces, time.time() - t0)
        write(draws, traces)
        # final step size: mean over last half of the window's trace
        # (reference inference.py:439-441)
        ss_trace = traces.hmc.step_size  # [C, n]
        step_size = jnp.mean(ss_trace[:, schedule.last_window // 2 :], axis=1)

    # ---- sampling bursts ------------------------------------------------------
    _log("Sampling...")
    fixed_run = make_fixed_runner(step_sample, config.num_burst_samples)
    if autotune:
        # Decays are FROZEN at their end-of-warmup values — the sampling
        # kernel is fixed, so exactness is untouched.
        _burst = jax.jit(
            jax.vmap(fixed_run, in_axes=(0, 0, 0, 0, None, None))
        )
        burst = lambda k, s, ss, im, m: _burst(k, s, ss, im, m, decays)
    else:
        burst = jax.jit(jax.vmap(fixed_run, in_axes=(0, 0, 0, 0, None)))

    # Host-side HDF5 writes run on a single worker thread so burst b's
    # write overlaps burst b+1's device compute; checkpoints lag one burst
    # (saved only once the corresponding write has landed).
    from concurrent.futures import ThreadPoolExecutor

    executor = ThreadPoolExecutor(max_workers=1)
    pending_write = None
    pending_ckpt = None

    def flush_pending():
        nonlocal pending_write, pending_ckpt
        if pending_write is not None:
            pending_write.result()
            pending_write = None
        if checkpoint_path and pending_ckpt is not None:
            ckpt.save(checkpoint_path, **pending_ckpt)
            pending_ckpt = None

    # Between-burst convergence gate (SURVEY.md §5 "gated burst loop"):
    # scalar-parameter draws accumulate host-side (they're already coming
    # back for the HDF5 write); sampling stops once every enabled criterion
    # holds.  On resume the gate sees only post-resume draws.
    gating = config.rhat_stop is not None or config.ess_stop is not None
    gate_hist = []
    stopped_early = False

    sampling_t0 = time.time()
    for b in range(start_burst, config.num_bursts):
        if config.profile_dir and b == max(start_burst, 1):
            jax.profiler.start_trace(config.profile_dir)
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, draws, traces = burst(
            shard(jax.random.split(sub, C)), state, step_size, inv_mass,
            model,
        )
        flush_pending()  # overlaps with the device computing this burst
        jax.block_until_ready(state)
        if config.profile_dir and b == max(start_burst, 1):
            jax.profiler.stop_trace()
        log.event(
            "burst", index=b, draws=config.num_burst_samples,
            hmc_accept=round(
                float(np.asarray(traces.hmc.is_accepted).mean()), 4
            ),
            draws_per_sec=round(
                config.num_burst_samples * C / max(time.time() - t0, 1e-9), 2
            ),
        )
        if thin > 1:
            # keep draws thin-1, 2*thin-1, ... (stride convention matches
            # posterior/thin.py); draws/traces are chain-major [C, n, ...]
            draws_w = jax.tree.map(lambda x: x[:, thin - 1 :: thin], draws)
            traces_w = jax.tree.map(
                lambda x: np.asarray(x)[:, thin - 1 :: thin], traces
            )
        else:
            draws_w, traces_w = draws, traces
        pending_write = executor.submit(write_at, draws_w, traces_w, offset)
        offset += stored_per_burst
        pending_ckpt = dict(
            state=state,
            key=key,
            step_size=step_size,
            inv_mass_diag=inv_mass,
            offset=offset,
            extra={"burst": b + 1, "log_decays": list(log_decays)},
        )
        _log(f"burst {b + 1}/{config.num_bursts}")
        if gating:
            from covid19uk_tpu.parallel.diagnostics import gate_statistics

            u_scal = np.array(np.asarray(draws.u)[..., :6])  # [C, n, 6]
            u_scal[..., :2] = np.logaddexp(0.0, u_scal[..., :2])  # softplus
            gate_hist.append(u_scal)
            acc = np.concatenate(gate_hist, axis=1)
            max_rhat, min_ess = gate_statistics(acc)
            ok_rhat = (
                config.rhat_stop is None or max_rhat < config.rhat_stop
            )
            ok_ess = config.ess_stop is None or min_ess >= config.ess_stop
            log.event(
                "gate", burst=b, max_rhat=round(max_rhat, 4),
                min_ess=round(min_ess, 1),
                converged=bool(ok_rhat and ok_ess),
            )
            if ok_rhat and ok_ess:
                _log(
                    f"Convergence gate met at burst {b + 1} "
                    f"(max R-hat {max_rhat:.4f}, min ESS {min_ess:.0f}); "
                    "stopping early"
                )
                stopped_early = True
                break
    flush_pending()
    executor.shutdown()
    if stopped_early:
        posterior.truncate(offset)
    sampling_wall = time.time() - sampling_t0

    # ---- cross-chain convergence diagnostics ------------------------------
    _report_diagnostics(
        posterior, warmup_stored, C, squeeze, sampling_wall, log
    )
    log.close()
    return posterior


def _report_diagnostics(posterior, warmup_total, C, squeeze, sampling_wall,
                        log):
    """Split R-hat + ESS + ESS/sec over the sampling phase for the scalar
    parameters — the convergence gate the reference never had
    (SURVEY.md §5 'Metrics')."""
    from covid19uk_tpu.parallel.diagnostics import (
        effective_sample_size,
        potential_scale_reduction,
    )

    scalars = ["psi", "sigma_space", "beta_area", "gamma0", "gamma1",
               "alpha_0"]
    summary = {}
    for name in scalars:
        draws = np.asarray(posterior[f"samples/{name}"][warmup_total:])
        if squeeze:
            draws = draws[None, :]  # [1, N]
        else:
            draws = draws.T  # [C, N]
        ess = float(np.min(np.asarray(effective_sample_size(
            jnp.asarray(draws)))))
        entry = {"ess": round(ess, 1),
                 "ess_per_sec": round(ess / max(sampling_wall, 1e-9), 2)}
        if draws.shape[0] > 1:
            entry["rhat"] = round(
                float(np.max(np.asarray(potential_scale_reduction(
                    jnp.asarray(draws))))), 4
            )
        summary[name] = entry
    log.event("diagnostics", sampling_wall_s=round(sampling_wall, 2),
              **summary)
    for name, entry in summary.items():
        _log(f"  {name}: ESS={entry['ess']} ({entry['ess_per_sec']}/s)"
             + (f" R-hat={entry['rhat']}" if "rhat" in entry else ""))


def initialize_from_cases(cases, N, seed, impute_rates=(0.25, 0.5)):
    """The production initialization (reference inference.py:490-513):
    tile the last week 3x as an occult runway, geometrically impute the
    latent S->E / E->I events from the observed I->R cases, reconstruct
    the state, take the initial state at the inference start, and clip
    the 21-day runway off the events.

    Args:
      cases: ``[M, T0]`` observed daily case (removal) counts.
      N: ``[M]`` population sizes.
      seed: imputation RNG seed.
      impute_rates: geometric lag rates (I->R->E->I, E->I->S->E); the
        default is the reference's (0.25, 0.5).  These are inconsistent
        with the model's own sojourn rates and bias the derived initial
        state (gamma0 −13 posterior sd at NI scale, docs/calibration.md);
        pass ``(removal_rate_estimate, 0.28)`` to reduce the offset.

    Returns:
      (initial_state ``[M, 4]`` float64 numpy, events ``[M, T, 3]`` float64
      numpy) with ``T = T0 + 21 - 21 = T0``.
    """
    cases = np.asarray(cases, np.float64)
    cases_ext = np.concatenate(
        [cases, np.tile(cases[:, -7:], (1, 3))], axis=1
    )
    events_full = impute.impute_censored_events(
        cases_ext, seed=seed, rates=impute_rates
    )
    N = np.squeeze(np.asarray(N, np.float64))
    init0 = np.concatenate([N[:, None], np.zeros((N.shape[0], 3))], axis=-1)
    state_full = np.asarray(
        seir.compute_state(
            jnp.asarray(init0, jnp.float64), jnp.asarray(events_full)
        )
    )
    start_time = state_full.shape[1] - cases_ext.shape[1]
    initial_state = state_full[:, start_time, :]
    events = events_full[:, start_time:-21, :]  # clip the runway
    return initial_state, events


def mcmc(data_file, output_file, config):
    """Constructs and runs the MCMC (reference inference.py:473-608).

    Args:
      data_file: HDF5 with groups ``constant_data`` and ``observations``.
      output_file: posterior HDF5 output path.
      config: the ``Mcmc`` config section (example_config.yaml:25-34), plus
        optional extras: num_chains, dtype, seed, checkpoint.
    """
    if isinstance(config, dict):
        config = McmcConfig.from_dict(config)
    # Multi-host: joins the jax.distributed coordinator when the standard
    # cluster env vars are set (no-op single-process; must precede any
    # backend use).  SURVEY.md §5 'Distributed communication backend'.
    from covid19uk_tpu.parallel.distributed import initialize as dist_init

    dist_init()
    if config.debug_nans:
        jax.config.update("jax_debug_nans", True)
    dtype = jnp.float64 if config.dtype == "float64" else jnp.float32

    constant_data = ncio.load_group(data_file, "constant_data")
    observations = ncio.load_group(data_file, "observations")
    cases = np.asarray(observations["cases"], np.float64)  # [M, T0]
    dates = observations.coords.get("time")

    initial_state, events = initialize_from_cases(
        cases, constant_data["N"], config.seed,
        impute_rates=tuple(getattr(config, "impute_rates", (0.25, 0.5))),
    )

    T = events.shape[1]
    M = events.shape[0]

    # keep_C=False: the raw directed flow matrix is only used by the
    # within/between CLI (which builds its own ModelData); skipping it
    # saves an [M, M] device transfer at MSOA scale.
    sparse = {"auto": "auto", "always": True, "never": False}[config.sparse]
    data = ModelData.create(
        constant_data.variables, dtype, sparse=sparse, keep_C=False,
        num_chains=config.num_chains,
    )
    model = CovidUK(
        data=data,
        initial_state=jnp.asarray(initial_state, dtype),
        initial_step=0,
        num_steps=T,
    )

    event_config = EventKernelConfig(
        dmax=config.dmax,
        mmax=config.m,
        nmax=config.nmax,
        occult_nmax=config.occult_nmax,
        num_event_time_updates=config.num_event_time_updates,
        t_range=(T - 21, T),
        move_decay=config.move_decay,
        x_decay=config.x_decay,
        compensate_gamma0=config.compensate_gamma0,
        num_compensated_updates=config.num_compensated_updates,
        num_pair_updates=config.num_pair_updates,
        pair_mmax=config.pair_mmax,
        pair_move_decay=config.pair_move_decay,
        pair_compensate_gamma0=config.pair_compensate_gamma0,
        gamma_gibbs=config.gamma_gibbs,
        occult_guided={"auto": "auto", "always": True, "never": False}[
            config.occult_guided
        ],
        move_guided={"auto": "auto", "always": True, "never": False}[
            config.move_guided
        ],
        move_guide_floor=config.move_guide_floor,
        occult_guide_floor=config.occult_guide_floor,
        fused_sweep=config.fused_sweep,
    )

    u0 = jnp.zeros((6 + (T - 1) + M,), dtype)  # reference inference.py:563-576
    chain_state = ChainState(u=u0, events=jnp.asarray(events, dtype))

    lp0 = model.joint_log_prob_unconstrained(chain_state.u, chain_state.events)
    print("Initial logpi:", float(lp0), flush=True)

    posterior = run_mcmc(
        model,
        chain_state,
        event_config,
        config,
        output_file,
        num_chains=config.num_chains,
        seed=config.seed,
        checkpoint_path=config.checkpoint,
    )
    posterior.create_dataset("initial_state", initial_state)
    if dates is not None:
        posterior.create_dataset(
            "time", np.asarray(dates).astype("datetime64[D]").astype(str).astype("S")
        )

    for name, key_ in [
        ("theta", "results/hmc/is_accepted"),
        ("move S->E", "results/move/S->E/is_accepted"),
        ("move E->I", "results/move/E->I/is_accepted"),
        ("occult S->E", "results/occult/S->E/is_accepted"),
        ("occult E->I", "results/occult/E->I/is_accepted"),
    ] + (
        [("gamma", "results/gamma/is_accepted")] if config.gamma_gibbs else []
    ):
        print(f"Acceptance {name}: {posterior[key_][:].mean()}")

    posterior.close()
