"""Tests for the fused event-sweep Pallas kernel (ops/pallas/fused_sweep).

Strategy (interpret mode on CPU — the kernel is a deterministic function
of a precomputed uniform table, so no TPU PRNG is involved):

1. numerics parity: the in-kernel Stirling binomial log-pmf vs
   ops.binomial's reference implementation over the full argument range;
2. consistency invariants after a real sweep on a valid epidemic:
   state == compute_state(init, events), commute == Cstar @ (I/N), and
   logp_out - logp_in == loglik(events_out) - loglik(events_in) computed
   by an independent evaluator — every ACCEPTED delta is exact;
3. distributional equivalence vs the XLA event kernels: same invariant
   distribution on a small model (matched acceptance rates and event-mass
   moments over a long run).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.models import seir
from covid19uk_tpu.ops import binomial
from covid19uk_tpu.ops.pallas import fused_sweep as fs


# ---------------------------------------------------------------------------
# fixtures: a valid simulated epidemic + likelihood context
# ---------------------------------------------------------------------------


def _simulate(rng, M, T, pop=500):
    """Forward-simulates the chain-binomial so every (n, k) cell is valid."""
    exp_eta = rng.uniform(0.5, 2.0, (M, 1)) * np.ones((M, T))
    psi_w = np.full(T, 0.5)
    rate_ir = np.full(T, 0.4)
    N = np.full(M, float(pop))
    C = rng.uniform(0.0, 20.0, (M, M))
    np.fill_diagonal(C, 0.0)
    Cstar = C + C.T

    state = np.zeros((M, 4))
    state[:, 0] = N - 10
    state[:, 1] = 5
    state[:, 2] = 5
    events = np.zeros((M, T, 3))
    init = state.copy()
    for t in range(T):
        commute = Cstar @ (state[:, 2] / N)
        rate_se = exp_eta[:, t] * (state[:, 2] + psi_w[t] * commute) / N
        p_se = 1.0 - np.exp(-rate_se)
        p_ei = 1.0 - np.exp(-float(seir.NU))
        p_ir = 1.0 - np.exp(-rate_ir[t])
        y0 = rng.binomial(state[:, 0].astype(int), p_se)
        y1 = rng.binomial(state[:, 1].astype(int), p_ei)
        y2 = rng.binomial(state[:, 2].astype(int), p_ir)
        events[:, t] = np.stack([y0, y1, y2], -1)
        state[:, 0] -= y0
        state[:, 1] += y0 - y1
        state[:, 2] += y1 - y2
        state[:, 3] += y2
    ctx = dict(
        exp_eta=jnp.asarray(exp_eta, jnp.float64),
        psi_w=jnp.asarray(psi_w, jnp.float64),
        rate_ir_t=jnp.asarray(rate_ir, jnp.float64),
        N=jnp.asarray(N, jnp.float64),
        Cstar=jnp.asarray(Cstar, jnp.float64),
    )
    return jnp.asarray(init, jnp.float64), jnp.asarray(events, jnp.float64), ctx


def _loglik(events, init, ctx):
    """Independent full chain-binomial log-likelihood (float64, exact
    lgamma via ops.binomial) at the fixed context parameters."""
    state = seir.compute_state(init, events)
    commute = ctx["Cstar"] @ (state[..., 2] / ctx["N"][:, None])
    rate_se = (
        ctx["exp_eta"]
        * (state[..., 2] + ctx["psi_w"][None, :] * commute)
        / ctx["N"][:, None]
        + 1e-9
    )
    lp = (
        binomial.binomial_log_pmf_from_rate(
            state[..., 0], events[..., 0], rate_se
        )
        + binomial.binomial_log_pmf_from_rate(
            state[..., 1], events[..., 1], float(seir.NU)
        )
        + binomial.binomial_log_pmf_from_rate(
            state[..., 2], events[..., 2], ctx["rate_ir_t"][None, :]
        )
    )
    return jnp.sum(lp)


def _run_sweep(key, events, state, commute, logp, ctx, **kw):
    kwargs = dict(
        mmax=2, nmax=6, dmax=5, occult_nmax=4, t_range=(kw.pop("t_lo"), kw.pop("t_hi")),
        num_updates=kw.pop("num_updates", 2),
        occult_guided=kw.pop("occult_guided", False),
        interpret=True,
    )
    kwargs.update(kw)
    return fs.fused_sweep(
        key, events, state, commute, logp,
        ctx["exp_eta"], ctx["psi_w"], ctx["rate_ir_t"], ctx["N"],
        ctx["Cstar"], 0.8, 0.8, 0.9, **kwargs,
    )


# ---------------------------------------------------------------------------
# 1. numerics parity
# ---------------------------------------------------------------------------


def test_inkernel_binomial_pmf_matches_reference():
    rng = np.random.default_rng(1)
    n = jnp.asarray(
        np.concatenate(
            [rng.integers(0, 30, 300), rng.integers(30, 2_000_000, 300)]
        ).astype(np.float64)
    )
    k = jnp.asarray(
        np.minimum(rng.integers(0, 25, 600), np.asarray(n)).astype(np.float64)
    )
    r = jnp.asarray(10.0 ** rng.uniform(-6, 0.8, 600))
    ref = binomial.binomial_log_pmf_from_rate(n, k, r)
    got = fs.binom_lp_rate(n, k, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    ref_nu = binomial.binomial_log_pmf_from_rate(n, k, float(seir.NU))
    got_nu = fs.binom_lp_nu(n, k)
    np.testing.assert_allclose(
        np.asarray(got_nu), np.asarray(ref_nu), atol=2e-5
    )


def test_inkernel_pmf_invalid_cells_are_neg_inf():
    got = fs.binom_lp_rate(
        jnp.asarray([5.0, 3.0, -1.0]),
        jnp.asarray([6.0, -1.0, 0.0]),
        jnp.asarray([0.1, 0.1, 0.1]),
    )
    assert np.all(np.isneginf(np.asarray(got)))


# ---------------------------------------------------------------------------
# 2. consistency invariants on a real sweep
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("guided", [False, True])
def test_sweep_invariants(guided):
    rng = np.random.default_rng(7)
    M, T = 6, 16
    init, events, ctx = _simulate(rng, M, T)
    n_acc = 0
    for seed in range(6):
        state = seir.compute_state(init, events)
        commute = ctx["Cstar"] @ (state[..., 2] / ctx["N"][:, None])
        lp0 = _loglik(events, init, ctx)
        ev2, st2, cm2, lp2, tr = _run_sweep(
            jax.random.PRNGKey(seed), events, state, commute, lp0, ctx,
            t_lo=T - 6, t_hi=T, occult_guided=guided, num_updates=3,
        )
        # state/commute kept incrementally consistent
        st_re = seir.compute_state(init, ev2)
        np.testing.assert_allclose(
            np.asarray(st2), np.asarray(st_re), atol=1e-3
        )
        cm_re = ctx["Cstar"] @ (st_re[..., 2] / ctx["N"][:, None])
        np.testing.assert_allclose(
            np.asarray(cm2), np.asarray(cm_re), atol=1e-2, rtol=1e-4
        )
        # accepted deltas exact: logp carry == independent re-evaluation
        lp_re = _loglik(ev2, init, ctx)
        assert abs(float(lp2 - lp0) - float(lp_re - lp0)) <= max(
            2e-3, 1e-4 * abs(float(lp_re - lp0))
        )
        n_acc += int(np.asarray(tr)[:, 0].sum())
        events = ev2  # continue the chain across seeds
    assert n_acc > 0, "sweep never accepted anything — test is vacuous"


def test_sweep_trace_layout():
    rng = np.random.default_rng(3)
    M, T = 5, 12
    init, events, ctx = _simulate(rng, M, T)
    state = seir.compute_state(init, events)
    commute = ctx["Cstar"] @ (state[..., 2] / ctx["N"][:, None])
    lp0 = _loglik(events, init, ctx)
    *_, lp2, tr = _run_sweep(
        jax.random.PRNGKey(0), events, state, commute, lp0, ctx,
        t_lo=T - 6, t_hi=T,
    )
    tr = np.asarray(tr)
    assert tr.shape == (4, 2 + 4 * 2)
    # acc flags are 0/1; logp_after of the last kernel equals the carry out
    assert set(np.unique(tr[:, 0])) <= {0.0, 1.0}
    assert abs(tr[3, 1] - float(lp2)) < 1e-3
    # move rows carry mmax location/time entries within range
    assert np.all((tr[0, 2:4] >= 0) & (tr[0, 2:4] < M))
    assert np.all((tr[0, 4:6] >= 0) & (tr[0, 4:6] < T))
    # occult rows: location, time in t_range, direction in {-1, +1}
    assert 0 <= tr[2, 2] < M and T - 6 <= tr[2, 3] < T
    assert tr[2, 4] in (-1.0, 1.0)


# ---------------------------------------------------------------------------
# 3. distributional equivalence vs the XLA event kernels
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_sweep_matches_xla_kernels_distribution():
    """Both sweeps leave the same target invariant: run each for many
    draws from the same valid start and compare acceptance rates and the
    posterior mean/sd of the latent event masses."""
    from covid19uk_tpu.inference.event_kernels import (
        event_move_step,
        occult_step,
    )
    from covid19uk_tpu.inference.likelihood import (
        LikelihoodContext,
        WindowedEvaluator,
    )

    rng = np.random.default_rng(11)
    M, T = 5, 12
    init, events0, ctx = _simulate(rng, M, T)
    t_lo, t_hi = T - 6, T
    n_draws = 400

    # --- XLA chain -------------------------------------------------------
    lctx = LikelihoodContext(
        exp_eta=ctx["exp_eta"], psi_w=ctx["psi_w"] * 1.0,
        rate_ir_t=ctx["rate_ir_t"], nu=jnp.float64(float(seir.NU)),
        Cstar=ctx["Cstar"], N=ctx["N"],
    )
    move_eval = WindowedEvaluator(ctx=lctx, window=min(5 + 1, T))
    occ_eval = WindowedEvaluator(ctx=lctx, window=T - t_lo)

    @jax.jit
    def xla_step(key, events, state, commute, lp):
        accs = []
        ka, kb, kc, kd = jax.random.split(key, 4)
        events, state, commute, lp, i1 = event_move_step(
            ka, events, state, lp, move_eval, 0, 5, 2, 6, 0.8, 0.9,
            commute=commute,
        )
        events, state, commute, lp, i2 = event_move_step(
            kb, events, state, lp, move_eval, 1, 5, 2, 6, 0.8, 0.9,
            commute=commute,
        )
        events, state, commute, lp, i3 = occult_step(
            kc, events, state, lp, occ_eval, 0, (t_lo, t_hi), 4, 0.9,
            commute=commute,
        )
        events, state, commute, lp, i4 = occult_step(
            kd, events, state, lp, occ_eval, 1, (t_lo, t_hi), 4, 0.9,
            commute=commute,
        )
        accs = jnp.stack(
            [i.is_accepted for i in (i1, i2, i3, i4)]
        ).astype(jnp.float64)
        return events, state, commute, lp, accs

    def run_chain(stepper, key):
        events = events0
        state = seir.compute_state(init, events)
        commute = ctx["Cstar"] @ (state[..., 2] / ctx["N"][:, None])
        lp = _loglik(events, init, ctx)
        acc_sum = np.zeros(4)
        mass = []
        for i in range(n_draws):
            key, sub = jax.random.split(key)
            events, state, commute, lp, accs = stepper(
                sub, events, state, commute, lp
            )
            acc_sum += np.asarray(accs)
            mass.append(
                [float(events[..., 0].sum()), float(events[..., 1].sum())]
            )
        return acc_sum / n_draws, np.asarray(mass[n_draws // 4:])

    def pallas_step(key, events, state, commute, lp):
        ev2, st2, cm2, lp2, tr = _run_sweep(
            key, events, state, commute, lp, ctx,
            t_lo=t_lo, t_hi=t_hi, num_updates=1,
        )
        return ev2, st2, cm2, lp2, np.asarray(tr)[:, 0]

    acc_x, mass_x = run_chain(xla_step, jax.random.PRNGKey(100))
    acc_p, mass_p = run_chain(pallas_step, jax.random.PRNGKey(200))

    # same invariant distribution: acceptance within MC error, event-mass
    # moments within a few posterior sds of each other
    np.testing.assert_allclose(acc_p, acc_x, atol=0.12)
    for j in range(2):
        mx, sx = mass_x[:, j].mean(), mass_x[:, j].std() + 1e-9
        mp = mass_p[:, j].mean()
        assert abs(mp - mx) < 4.0 * sx, (
            f"event-mass {j}: pallas {mp:.1f} vs xla {mx:.1f} (sd {sx:.1f})"
        )


# ---------------------------------------------------------------------------
# 4. integration through gibbs.make_mcmc_step (fused_sweep="always")
# ---------------------------------------------------------------------------


def _full_step_fixtures():
    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    M, T = 11, 32
    model = build_synthetic_model(M, T, jnp.float32)
    state = initial_chain_state(model)
    cfg = EventKernelConfig(
        dmax=14, mmax=2, nmax=10, occult_nmax=5,
        num_event_time_updates=2, t_range=(T - 21, T),
    )
    tune = HMCTunables(
        step_size=jnp.asarray(0.001, jnp.float32),
        inv_mass_diag=jnp.ones_like(state.u),
    )
    return model, state, cfg, tune, make_mcmc_step


def test_full_step_fused_runs_and_keeps_invariants():
    """The fused step must (a) jit and run, (b) keep the event tensor
    valid (state nonneg, events nonneg), (c) produce a StepTrace with the
    same pytree structure as the XLA path (driver compatibility)."""
    model, state, cfg, tune, make_mcmc_step = _full_step_fixtures()
    step_x = make_mcmc_step(model, 2, cfg)
    step_f = make_mcmc_step(model, 2, cfg._replace(fused_sweep="always"))
    key = jax.random.PRNGKey(3)
    s_x, tr_x = jax.jit(step_x)(key, state, tune)
    s_f, tr_f = jax.jit(step_f)(key, state, tune)

    assert np.all(np.asarray(s_f.events) >= 0)
    st = seir.compute_state(model.initial_state, s_f.events)
    assert np.all(np.asarray(st) >= -1e-3)
    # identical trace pytree structure (shapes + dtypes field by field)
    jx = jax.tree_util.tree_structure(tr_x)
    jf = jax.tree_util.tree_structure(tr_f)
    assert jx == jf
    for a, b in zip(jax.tree.leaves(tr_x), jax.tree.leaves(tr_f)):
        assert jnp.shape(a) == jnp.shape(b), (a, b)


def test_full_step_fused_vmaps_over_chains():
    model, state, cfg, tune, make_mcmc_step = _full_step_fixtures()
    step_f = make_mcmc_step(model, 2, cfg._replace(fused_sweep="always"))
    C = 3
    states = jax.tree.map(lambda x: jnp.stack([x] * C), state)

    @jax.jit
    def run(keys, states):
        def body(ss, ks):
            ss, tr = jax.vmap(step_f, in_axes=(0, 0, None))(ks, ss, tune)
            return ss, tr

        key_mat = jax.vmap(lambda k: jax.random.split(k, C))(
            jax.random.split(jax.random.PRNGKey(5), 8)
        )
        return jax.lax.scan(body, states, key_mat)

    s, tr = run(jax.random.split(jax.random.PRNGKey(5), C), states)
    assert s.events.shape == (C,) + state.events.shape
    assert tr.move_se.is_accepted.shape == (8, C)
    # chains must de-correlate (different keys -> different sweeps); over
    # 8 draws x (8 MH + 2 pair) proposals at ~0.1-0.2 acceptance the odds
    # of two chains rejecting everything are negligible
    assert not np.array_equal(np.asarray(s.events[0]), np.asarray(s.events[1]))


def test_full_step_fused_rejects_incompatible_knobs():
    from covid19uk_tpu.inference.gibbs import EventKernelConfig, make_mcmc_step
    from covid19uk_tpu.utils.synthetic import build_synthetic_model

    model = build_synthetic_model(6, 16, jnp.float32)
    base = EventKernelConfig(
        dmax=5, mmax=2, nmax=6, occult_nmax=4,
        num_event_time_updates=1, t_range=(10, 16),
        fused_sweep="always",
    )
    for bad in (
        dict(gamma_gibbs=True),
        dict(compensate_gamma0=True),
        dict(move_guided="always"),
        dict(pair_compensate_gamma0=True, num_pair_updates=1),
    ):
        with pytest.raises(ValueError):
            make_mcmc_step(model, 2, base._replace(**bad))
    with pytest.raises(ValueError):
        make_mcmc_step(model, 2, base._replace(fused_sweep="sometimes"))


def test_driver_mcmc_with_fused_config_knob(tmp_path, rng):
    """The production driver path: Mcmc(fused_sweep="always") must run the
    full warmup + burst pipeline (autotuned decays flow through the fused
    kernel as traced scalars) and write a results store with the same
    layout as the XLA path."""
    import h5py

    from covid19uk_tpu.inference.driver import mcmc
    from tests.test_driver import make_synthetic_datafile

    path = str(tmp_path / "data.h5")
    make_synthetic_datafile(path, rng, M=3, T0=25)
    cfg = dict(
        dmax=4, nmax=8, m=2, occult_nmax=4, num_event_time_updates=2,
        num_bursts=1, num_burst_samples=4, thin=1, dtype="float64",
        seed=1, num_chains=2, fused_sweep="always",
        warmup=dict(first_window=4, slow_window=4, num_slow_windows=1,
                    last_window=4),
    )
    out = str(tmp_path / "fused.h5")
    mcmc(path, out, cfg)
    with h5py.File(out, "r") as f:
        assert f["samples/psi"].shape[0] > 0
        assert "results/move/S->E/is_accepted" in f
        assert "results/occult/S->E/is_accepted" in f
        assert np.all(np.isfinite(f["samples/seir"][:]))


@pytest.mark.slow
def test_full_step_fused_matches_xla_distribution():
    """End-to-end A/B through make_mcmc_step: the fused and XLA sweeps
    must target the same posterior — compare latent event-mass moments
    and gamma0 over a long run (pair updates ON in both, their default)."""
    model, state, cfg, tune, make_mcmc_step = _full_step_fixtures()

    def chain(step, key, n=600):
        def body(s, k):
            s, _ = step(k, s, tune)
            return s, (jnp.sum(s.events[..., 0]), s.u[3])

        _, (mass, g0) = jax.lax.scan(body, state, jax.random.split(key, n))
        return np.asarray(mass)[n // 4:], np.asarray(g0)[n // 4:]

    m_x, g_x = chain(
        jax.jit(make_mcmc_step(model, 2, cfg)), jax.random.PRNGKey(0)
    )
    m_f, g_f = chain(
        jax.jit(make_mcmc_step(model, 2, cfg._replace(fused_sweep="always"))),
        jax.random.PRNGKey(1),
    )
    sx = m_x.std() + 1e-9
    assert abs(m_f.mean() - m_x.mean()) < 4.0 * sx, (
        f"event mass: fused {m_f.mean():.1f} vs xla {m_x.mean():.1f} "
        f"(sd {sx:.1f})"
    )
    sg = g_x.std() + 1e-9
    assert abs(g_f.mean() - g_x.mean()) < 4.0 * sg
