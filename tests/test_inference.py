"""Statistical correctness tests for the MCMC kernels.

The event-kernel tests are *exact stationarity* checks: on a tiny event
tensor the kernel's reachable state space is enumerable, so we compare the
empirical occupancy of a long chain against the true normalized target.
This is a much sharper test than acceptance-rate eyeballing — any Hastings
factor error fails it immediately.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covid19uk_tpu.inference import dual_averaging, welford
from covid19uk_tpu.inference.hmc import hmc_step
from covid19uk_tpu.inference.event_kernels import event_move_step, occult_step
from covid19uk_tpu.inference.likelihood import (
    FullEvaluator,
    WindowedEvaluator,
    make_context,
)


# ---------------------------------------------------------------- welford


def test_welford_matches_numpy(rng):
    xs = rng.normal(2.0, 3.0, size=(500, 4))
    st = welford.init((4,), jnp.float64)
    for x in xs:
        st = welford.update(st, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(st.mean), xs.mean(0), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(welford.variance(st)), xs.var(0), rtol=1e-10
    )


def test_welford_from_draws_uses_last_half(rng):
    draws = rng.normal(size=(100, 3))
    st = welford.from_draws(jnp.asarray(draws))
    np.testing.assert_allclose(
        np.asarray(st.mean), draws[50:].mean(0), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(welford.variance(st)), draws[50:].var(0), rtol=1e-10
    )


# ---------------------------------------------------------------- HMC


def test_hmc_recovers_gaussian_moments():
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    prec = np.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ jnp.asarray(prec) @ x

    step_size = 0.4
    n = 4000

    def body(carry, key):
        x = carry
        x, info = hmc_step(key, x, logp, step_size, 8)
        return x, (x, info.is_accepted)

    keys = jax.random.split(jax.random.PRNGKey(0), n)
    _, (draws, accepted) = jax.lax.scan(
        body, jnp.zeros(2, jnp.float64), keys
    )
    draws = np.asarray(draws[500:])
    assert 0.6 < np.asarray(accepted).mean() <= 1.0
    np.testing.assert_allclose(draws.mean(0), [0, 0], atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.3)


def test_hmc_preconditioning_improves_scale_mismatch():
    """With inv_mass = posterior variance, HMC mixes across a 1e4 scale gap."""
    scales = jnp.asarray(np.array([100.0, 0.01]), jnp.float64)

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    inv_mass = scales**2

    def body(x, key):
        x, info = hmc_step(key, x, logp, 0.5, 8, inv_mass)
        return x, (x, info.is_accepted)

    keys = jax.random.split(jax.random.PRNGKey(1), 3000)
    _, (draws, acc) = jax.lax.scan(body, jnp.zeros(2, jnp.float64), keys)
    draws = np.asarray(draws[500:])
    assert np.asarray(acc).mean() > 0.5
    np.testing.assert_allclose(
        draws.std(0), np.asarray(scales), rtol=0.2
    )


def test_dual_averaging_hits_target_accept():
    def logp(x):
        return -0.5 * jnp.sum(x**2)

    da = dual_averaging.init(1.0, jnp.float64)

    def body(carry, key):
        x, da = carry
        x, info = hmc_step(
            key, x, logp, dual_averaging.step_size(da), 8
        )
        da = dual_averaging.update(
            da, jnp.minimum(1.0, jnp.exp(info.log_accept_ratio))
        )
        return (x, da), info.is_accepted

    keys = jax.random.split(jax.random.PRNGKey(2), 600)
    (_, da), accepted = jax.lax.scan(
        body, (jnp.zeros(3, jnp.float64), da), keys
    )
    late_accept = np.asarray(accepted)[-300:].mean()
    assert 0.6 < late_accept < 0.9  # targets 0.75


# ------------------------------------------------- event kernel stationarity


def _enumerate_compositions(total, length):
    """All ways to place `total` indistinct events into `length` cells."""
    for cuts in itertools.combinations(range(total + length - 1), length - 1):
        prev = -1
        out = []
        for c in cuts + (total + length - 1,):
            out.append(c - prev - 1)
            prev = c
        yield tuple(out)


import pytest


@pytest.mark.parametrize(
    "move_decay,x_decay",
    [(0.9, 1.0), (1.0, 1.0), (0.9, 0.7), ("traced-0.85", 0.7)],
)
def test_event_move_kernel_exact_stationarity(move_decay, x_decay):
    """Move kernel preserves an enumerable target distribution exactly —
    under both the geometric and the uniform displacement proposals, and
    with the decay passed as a TRACED scalar (the acceptance-autotuning
    path: driver.py passes retuned decays through the jit boundary).

    M=1 location, T=4 times, 3 total events of type 0 => 20 states.
    Target: arbitrary smooth positive weights.  Chi-square the occupancy.
    """
    if isinstance(move_decay, str):
        move_decay = jnp.asarray(float(move_decay.split("-")[1]), jnp.float64)
    T, total = 4, 3
    w = jnp.asarray(np.array([0.2, 1.0, -0.5, 0.7]), jnp.float64)

    def logp_fn(events):
        c = events[0, :, 0]
        return jnp.sum(c * w) - 0.1 * jnp.sum(c**2)

    states = list(_enumerate_compositions(total, T))
    state_idx = {s: i for i, s in enumerate(states)}
    logps = np.array(
        [
            float(
                logp_fn(
                    jnp.zeros((1, T, 3), jnp.float64)
                    .at[0, :, 0]
                    .set(jnp.asarray(np.array(s), jnp.float64))
                )
            )
            for s in states
        ]
    )
    target = np.exp(logps - logps.max())
    target /= target.sum()

    init = jnp.zeros((1, T, 3), jnp.float64).at[0, :, 0].set(
        jnp.asarray(np.array(states[0]), jnp.float64)
    )
    ev = FullEvaluator(logp_fn=logp_fn)
    st0 = jnp.zeros((1, T, 4), jnp.float64)

    def body(carry, key):
        events, st, logp = carry
        events, st, logp, info = event_move_step(
            key, events, st, logp, ev, 0, dmax=3, mmax=1, nmax=2,
            move_decay=move_decay, x_decay=x_decay,
        )
        return (events, st, logp), events[0, :, 0]

    n = 40000
    keys = jax.random.split(jax.random.PRNGKey(3), n)
    (_, _, _), trace = jax.lax.scan(body, (init, st0, logp_fn(init)), keys)
    trace = np.asarray(trace[2000:]).astype(int)

    counts = np.zeros(len(states))
    for row in trace:
        counts[state_idx[tuple(row)]] += 1
    freq = counts / counts.sum()
    # total-variation distance small
    tv = 0.5 * np.abs(freq - target).sum()
    assert tv < 0.03, (tv, freq, target)


@pytest.mark.parametrize("x_decay", [1.0, 0.7])
def test_occult_kernel_exact_stationarity(x_decay):
    """Occult add/delete kernel preserves an enumerable target exactly.

    M=1, T=4, t_range=(2,4): the kernel touches cells (0,2,0) and (0,3,0).
    Target caps counts at 4 => 25 states.
    """
    T = 4
    cap = 4.0

    def logp_fn(events):
        c2, c3 = events[0, 2, 0], events[0, 3, 0]
        ok = (c2 <= cap) & (c3 <= cap)
        val = 0.8 * c2 - 0.3 * c3 - 0.15 * (c2 - c3) ** 2
        return jnp.where(ok, val, -jnp.inf)

    states = list(itertools.product(range(int(cap) + 1), repeat=2))
    logps = np.array(
        [
            float(
                logp_fn(
                    jnp.zeros((1, T, 3), jnp.float64)
                    .at[0, 2, 0].set(float(a))
                    .at[0, 3, 0].set(float(b))
                )
            )
            for a, b in states
        ]
    )
    target = np.exp(logps - logps.max())
    target /= target.sum()

    init = jnp.zeros((1, T, 3), jnp.float64)
    ev = FullEvaluator(logp_fn=logp_fn)
    st0 = jnp.zeros((1, T, 4), jnp.float64)

    def body(carry, key):
        events, st, logp = carry
        events, st, logp, info = occult_step(
            key, events, st, logp, ev, 0, t_range=(2, 4), nmax=3,
            x_decay=x_decay,
        )
        return (events, st, logp), (events[0, 2, 0], events[0, 3, 0])

    n = 60000
    keys = jax.random.split(jax.random.PRNGKey(4), n)
    (_, _, _), trace = jax.lax.scan(body, (init, st0, logp_fn(init)), keys)
    a = np.asarray(trace[0][3000:]).astype(int)
    b = np.asarray(trace[1][3000:]).astype(int)

    counts = np.zeros(len(states))
    idx = {s: i for i, s in enumerate(states)}
    for pair in zip(a, b):
        counts[idx[pair]] += 1
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - target).sum()
    assert tv < 0.03, (tv, freq.round(3), target.round(3))


def test_guided_occult_kernel_exact_stationarity():
    """Guided occult proposal (location ~ fixed Categorical, not Uniform)
    preserves an enumerable target exactly.

    The guide's location factor must cancel from the Hastings ratio
    (forward add and reverse delete pick the SAME location, and the
    weights are state-independent) — this test would detect a missing
    correction: the guide is skewed 85/15 across M=2 locations whose
    target marginals differ, so an uncorrected proposal would visibly
    overweight location 0's high-count states.

    M=2, T=4, t_range=(2,4): 4 cells, counts capped at 2 => 81 states.
    """
    T, cap = 4, 2.0
    w = np.array([[0.9, -0.4], [-0.6, 0.8]])  # [loc, t-2] weights

    def logp_fn(events):
        c = events[:, 2:4, 0]  # [2, 2]
        ok = jnp.all(c <= cap)
        val = jnp.sum(c * w) - 0.1 * jnp.sum(c**2)
        return jnp.where(ok, val, -jnp.inf)

    states = list(itertools.product(range(int(cap) + 1), repeat=4))
    logps = np.array(
        [
            float(
                logp_fn(
                    jnp.zeros((2, T, 3), jnp.float64)
                    .at[:, 2:4, 0]
                    .set(jnp.asarray(np.array(s, float).reshape(2, 2)))
                )
            )
            for s in states
        ]
    )
    target = np.exp(logps - logps.max())
    target /= target.sum()

    init = jnp.zeros((2, T, 3), jnp.float64)
    ev = FullEvaluator(logp_fn=logp_fn)
    st0 = jnp.zeros((2, T, 4), jnp.float64)
    guide = jnp.log(jnp.asarray(np.array([0.85, 0.15])))

    def body(carry, key):
        events, st, logp = carry
        events, st, logp, info = occult_step(
            key, events, st, logp, ev, 0, t_range=(2, 4), nmax=2,
            x_decay=0.8, guide_logits=guide,
        )
        return (events, st, logp), events[:, 2:4, 0]

    n = 150000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    (_, _, _), trace = jax.lax.scan(body, (init, st0, logp_fn(init)), keys)
    trace = np.asarray(trace[5000:]).astype(int).reshape(-1, 4)

    counts = np.zeros(len(states))
    idx = {s: i for i, s in enumerate(states)}
    for row in trace:
        counts[idx[tuple(row)]] += 1
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - target).sum()
    assert tv < 0.04, (tv,)


def test_guided_move_kernel_exact_stationarity():
    """Guided MOVE proposal (locations ~ fixed weighted-without-replacement
    Gumbel-top-k, not uniform) preserves an enumerable target exactly.

    Like the guided occult test: the location weights are state-independent
    so the location factor cancels from the Hastings ratio (forward and
    reverse moves use the same location set with identical probability).
    A skewed 85/15 guide over M=2 locations whose target time-profiles
    differ would visibly distort the occupancy if a correction were
    (wrongly) required or (wrongly) omitted.

    M=2, T=4, per-location totals fixed by the move kernel (2 and 1
    events of type 0) => 10 x 4 = 40 states.
    """
    T = 4
    w = np.array([[0.2, 1.0, -0.5, 0.7], [0.9, -0.6, 0.3, -0.2]])

    def logp_fn(events):
        c = events[:, :, 0]  # [2, T]
        return jnp.sum(c * w) - 0.1 * jnp.sum(c**2)

    states = [
        (a, b)
        for a in _enumerate_compositions(2, T)
        for b in _enumerate_compositions(1, T)
    ]
    logps = np.array(
        [
            float(
                logp_fn(
                    jnp.zeros((2, T, 3), jnp.float64)
                    .at[:, :, 0]
                    .set(jnp.asarray(np.array(s, float)))
                )
            )
            for s in states
        ]
    )
    target = np.exp(logps - logps.max())
    target /= target.sum()

    init = (
        jnp.zeros((2, T, 3), jnp.float64)
        .at[0, 0, 0].set(2.0)
        .at[1, 0, 0].set(1.0)
    )
    ev = FullEvaluator(logp_fn=logp_fn)
    st0 = jnp.zeros((2, T, 4), jnp.float64)
    guide = jnp.log(jnp.asarray(np.array([0.85, 0.15])))

    def body(carry, key):
        events, st, logp = carry
        events, st, logp, info = event_move_step(
            key, events, st, logp, ev, 0, dmax=3, mmax=1, nmax=2,
            move_decay=0.9, x_decay=0.8, guide_logits=guide,
        )
        return (events, st, logp), events[:, :, 0]

    n = 150000
    keys = jax.random.split(jax.random.PRNGKey(13), n)
    (_, _, _), trace = jax.lax.scan(body, (init, st0, logp_fn(init)), keys)
    trace = np.asarray(trace[5000:]).astype(int)

    counts = np.zeros(len(states))
    idx = {s: i for i, s in enumerate(states)}
    for row in trace:
        counts[idx[(tuple(row[0]), tuple(row[1]))]] += 1
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - target).sum()
    assert tv < 0.04, (tv,)


def test_make_mcmc_step_rejects_bad_guided_vocab():
    """Guided-proposal knobs must reject stray strings: a truthy string
    like "never" passed straight to EventKernelConfig (bypassing the
    driver's CLI mapping) must raise, not silently ENABLE guiding."""
    from covid19uk_tpu.inference.gibbs import EventKernelConfig, make_mcmc_step
    from covid19uk_tpu.utils.synthetic import build_synthetic_model

    model = build_synthetic_model(3, 8, jnp.float64)
    for field in ("occult_guided", "move_guided"):
        with pytest.raises(ValueError, match=field):
            make_mcmc_step(
                model, 2, EventKernelConfig(**{field: "nevr"})
            )
    for field in ("occult_guide_floor", "move_guide_floor"):
        with pytest.raises(ValueError, match=field):
            make_mcmc_step(
                model, 2, EventKernelConfig(**{field: 0.0})
            )
    # the full vocabulary resolves without error
    for val in ("auto", "always", "never", True, False):
        make_mcmc_step(
            model, 2, EventKernelConfig(move_guided=val, t_range=(0, 8))
        )


def test_occult_null_delete_not_accepted():
    """A delete proposal drawn on an empty cell is a null move and must be
    traced as NOT accepted (gemlib semantics — otherwise acceptance-rate
    summaries are inflated by construction)."""
    T = 4
    # target forbids any events: adds are rejected by density, so every
    # delete is a delete-on-empty null
    logp_fn = lambda ev: jnp.where(jnp.sum(ev) > 0, -jnp.inf, 0.0)
    ev = FullEvaluator(logp_fn=logp_fn)
    init = jnp.zeros((1, T, 3), jnp.float64)
    st0 = jnp.zeros((1, T, 4), jnp.float64)

    def body(carry, key):
        events, st, logp = carry
        events, st, logp, info = occult_step(
            key, events, st, logp, ev, 0, t_range=(0, T), nmax=3
        )
        return (events, st, logp), info.is_accepted

    keys = jax.random.split(jax.random.PRNGKey(11), 400)
    (_, _, _), accepted = jax.lax.scan(body, (init, st0, 0.0), keys)
    assert not np.asarray(accepted).any()


def test_event_move_conserves_totals_and_validity(rng):
    """On the real model: moves conserve per-type totals, never touch I->R,
    and the state never goes negative."""
    from covid19uk_tpu.models import seir
    from covid19uk_tpu.models.spec import CovidUK
    from tests.test_spec import make_test_data, make_test_params

    M, T = 5, 12
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 50, np.full(M, 20.0), np.full(M, 30.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(5), params)

    logp_fn = lambda ev: model.log_prob(params, ev)
    logp = logp_fn(events)
    fe = FullEvaluator(logp_fn=logp_fn)
    st0 = seir.compute_state(model.initial_state, events)

    def body(carry, key):
        ev, st, lp = carry
        k1, k2, k3 = jax.random.split(key, 3)
        ev, st, lp, _ = event_move_step(k1, ev, st, lp, fe, 0, 5, 2, 10)
        ev, st, lp, _ = event_move_step(k2, ev, st, lp, fe, 1, 5, 2, 10)
        ev, st, lp, _ = occult_step(k3, ev, st, lp, fe, 0, (T - 4, T), 5)
        return (ev, st, lp), None

    keys = jax.random.split(jax.random.PRNGKey(6), 200)
    (ev_out, st_out, lp_out), _ = jax.lax.scan(body, (events, st0, logp), keys)

    ev0, ev1 = np.asarray(events), np.asarray(ev_out)
    # I->R slice untouched (observed data)
    np.testing.assert_array_equal(ev0[..., 2], ev1[..., 2])
    # E->I totals conserved (only move kernel touches type 1 here)
    np.testing.assert_allclose(ev0[..., 1].sum(), ev1[..., 1].sum())
    # validity invariant
    state = np.asarray(seir.compute_state(model.initial_state, ev_out))
    assert state.min() >= 0
    assert np.isfinite(float(lp_out))
    # the threaded state tensor stays consistent with the events
    np.testing.assert_allclose(np.asarray(st_out), state, rtol=1e-12)
    # the chain moved
    assert not np.array_equal(ev0[..., 0], ev1[..., 0])


def test_windowed_evaluator_matches_full(rng):
    """The windowed delta evaluation must produce the same chains as full
    re-evaluation: same keys => identical proposals => identical accepts,
    events, and log-probs (within float64 round-off)."""
    from covid19uk_tpu.models.spec import CovidUK
    from covid19uk_tpu.models import seir
    from tests.test_spec import make_test_data, make_test_params

    M, T = 6, 16
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60, np.full(M, 25.0), np.full(M, 35.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(8), params)
    st0 = seir.compute_state(model.initial_state, events)

    logp_fn = lambda ev: model.log_prob(params, ev)
    logp = logp_fn(events)
    fe = FullEvaluator(logp_fn=logp_fn)
    ctx = make_context(model, params)
    t_range = (T - 6, T)
    we_move = WindowedEvaluator(ctx=ctx, window=min(5 + 1, T))
    we_occ = WindowedEvaluator(ctx=ctx, window=T - t_range[0])

    def chain(evaluator_move, evaluator_occ):
        def body(carry, key):
            ev, st, lp = carry
            k1, k2, k3, k4 = jax.random.split(key, 4)
            ev, st, lp, i1 = event_move_step(
                k1, ev, st, lp, evaluator_move, 0, 5, 2, 10
            )
            ev, st, lp, i2 = event_move_step(
                k2, ev, st, lp, evaluator_move, 1, 5, 2, 10
            )
            ev, st, lp, i3 = occult_step(
                k3, ev, st, lp, evaluator_occ, 0, t_range, 5
            )
            ev, st, lp, i4 = occult_step(
                k4, ev, st, lp, evaluator_occ, 1, t_range, 5
            )
            acc = jnp.stack(
                [i1.is_accepted, i2.is_accepted, i3.is_accepted,
                 i4.is_accepted]
            )
            return (ev, st, lp), (lp, acc)

        keys = jax.random.split(jax.random.PRNGKey(9), 300)
        return jax.lax.scan(body, (events, st0, logp), keys)

    (ev_f, _, lp_f), (lps_f, acc_f) = chain(fe, fe)
    (ev_w, _, lp_w), (lps_w, acc_w) = chain(we_move, we_occ)

    np.testing.assert_array_equal(np.asarray(acc_f), np.asarray(acc_w))
    np.testing.assert_array_equal(np.asarray(ev_f), np.asarray(ev_w))
    np.testing.assert_allclose(
        np.asarray(lps_f), np.asarray(lps_w), rtol=1e-9, atol=1e-7
    )
    # some of each kernel type must have accepted for this to be a real test
    assert np.asarray(acc_f).mean(0).min() > 0.01


def test_joint_move_delta_matches_serial_telescoped(rng):
    """The one-shot joint windowed delta over mmax locations must equal the
    telescoped sum of serial per-location deltas (each evaluated from the
    partially-updated tensors) — including overlapping windows and E->I
    rate coupling."""
    from covid19uk_tpu.inference.likelihood import apply_event_delta
    from covid19uk_tpu.models.spec import CovidUK
    from covid19uk_tpu.models import seir
    from tests.test_spec import make_test_data, make_test_params

    M, T, W = 7, 20, 6
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60, np.full(M, 25.0), np.full(M, 35.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(21), params)
    state = seir.compute_state(model.initial_state, events)
    we = WindowedEvaluator(ctx=make_context(model, params), window=W)

    cases = [
        # (locs, t_from, t_to, xs) — overlapping and disjoint windows
        ([0, 3], [4, 5], [8, 2], [2.0, 1.0]),
        ([2, 6], [3, 15], [6, 12], [1.0, 3.0]),
        ([1, 4, 5], [10, 11, 9], [13, 8, 12], [2.0, 0.0, 1.0]),
    ]
    # W=6: L*W < T exercises the windowed (dedup-masked) branch; W=12:
    # L*W >= T exercises the full-T rate-delta branch (UK-scale shape).
    we_full = WindowedEvaluator(ctx=we.ctx, window=12)
    for evaluator in (we, we_full):
        for k in (0, 1):
            for locs, t_f, t_d, xs in cases:
                locs_a = jnp.asarray(locs)
                tf_a, td_a = jnp.asarray(t_f), jnp.asarray(t_d)
                xs_a = jnp.asarray(xs, jnp.float64)
                joint = float(
                    evaluator.joint_move_delta(
                        events, state, locs_a, tf_a, td_a, xs_a, k
                    )
                )
                ev_c, st_c, serial = events, state, 0.0
                for i in range(len(locs)):
                    serial += float(
                        evaluator.move_delta(
                            ev_c, st_c, locs_a[i], tf_a[i], td_a[i], xs_a[i],
                            k,
                        )
                    )
                    ev_c, st_c = apply_event_delta(
                        ev_c, st_c, locs_a[i], tf_a[i], td_a[i], xs_a[i], k
                    )
                np.testing.assert_allclose(
                    joint, serial, rtol=1e-9, atol=1e-9
                )


def test_occult_windowed_matches_full_interior_t_range(rng):
    """Occult t_range that does NOT end at T: an occult at t perturbs all
    later state, so the windowed evaluator must still agree with full
    re-evaluation (regression: the window used to cover only the proposal
    range, silently assuming t_range[1] == T)."""
    from covid19uk_tpu.models.spec import CovidUK
    from covid19uk_tpu.models import seir
    from tests.test_spec import make_test_data, make_test_params

    M, T = 5, 18
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60, np.full(M, 25.0), np.full(M, 35.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(11), params)
    st0 = seir.compute_state(model.initial_state, events)

    logp_fn = lambda ev: model.log_prob(params, ev)
    logp = logp_fn(events)
    fe = FullEvaluator(logp_fn=logp_fn)
    ctx = make_context(model, params)
    t_range = (T - 10, T - 4)  # interior range: tail cells change too
    we_occ = WindowedEvaluator(ctx=ctx, window=T - t_range[0])

    def chain(evaluator):
        def body(carry, key):
            ev, st, lp = carry
            k1, k2 = jax.random.split(key)
            ev, st, lp, i1 = occult_step(
                k1, ev, st, lp, evaluator, 0, t_range, 5
            )
            ev, st, lp, i2 = occult_step(
                k2, ev, st, lp, evaluator, 1, t_range, 5
            )
            return (ev, st, lp), jnp.stack([i1.is_accepted, i2.is_accepted])

        keys = jax.random.split(jax.random.PRNGKey(12), 250)
        return jax.lax.scan(body, (events, st0, logp), keys)

    (ev_f, _, lp_f), acc_f = chain(fe)
    (ev_w, _, lp_w), acc_w = chain(we_occ)

    np.testing.assert_array_equal(np.asarray(acc_f), np.asarray(acc_w))
    np.testing.assert_array_equal(np.asarray(ev_f), np.asarray(ev_w))
    np.testing.assert_allclose(float(lp_f), float(lp_w), rtol=1e-9)
    assert np.asarray(acc_f).mean() > 0.01


def test_make_mcmc_step_rejects_bad_t_range(rng):
    from covid19uk_tpu.inference.gibbs import EventKernelConfig, make_mcmc_step
    from covid19uk_tpu.models.spec import CovidUK
    from tests.test_spec import make_test_data

    M, T = 4, 12
    data = make_test_data(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 10, np.full(M, 5.0), np.full(M, 5.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    for bad in [(-1, T), (0, T + 1), (5, 5), (8, 4)]:
        with pytest.raises(ValueError, match="t_range"):
            make_mcmc_step(model, 4, EventKernelConfig(t_range=bad))


# ------------------------------------- compensated (gamma, events) kernel


def test_compensated_move_kernel_exact_stationarity():
    """The joint (gamma, events) ridge move preserves an enumerable-events
    x Gaussian-gamma target exactly.

    Target: pi(g, e) = pi_e(e) * N(g; mu(e), sigma^2) with mu(e) the same
    potential the kernel compensates along, so the event marginal is pi_e
    regardless of g.  The compensated kernel conserves g + potential and is
    not ergodic alone; compose with a random-walk MH on g.  Checks:
    (1) event-marginal occupancy matches pi_e (TV), (2) the residual
    g - mu(e) is N(0, sigma^2), (3) the threaded logp matches a full
    recompute at the end (delta-accounting exactness).
    """
    from covid19uk_tpu.inference.event_kernels import compensated_move_step

    T, total = 4, 3
    sigma = 0.4
    w = jnp.asarray(np.array([0.2, 1.0, -0.5, 0.7]), jnp.float64)
    # mu(e) = 0.1 * sum_s c_s * (T-1-s)  == 0.1 * sum_t E_t (state tensor)
    coef = 0.1 * jnp.asarray(np.arange(T - 1, -1, -1), jnp.float64)

    def a_fn(events):
        c = events[0, :, 0]
        return jnp.sum(c * w) - 0.1 * jnp.sum(c**2)

    def mu_fn(events):
        return jnp.sum(events[0, :, 0] * coef)

    def full_logp(g, events):
        return a_fn(events) - 0.5 * ((g - mu_fn(events)) / sigma) ** 2

    def potential(st):
        # STOICH[0] = S->E: E_t = sum_s c_s [t > s]; matches mu_fn
        return 0.1 * jnp.sum(st[0, :, 1])

    def gamma_delta(ev_new, st_new, g, g_new):
        mu = 0.1 * jnp.sum(st_new[0, :, 1])
        return -0.5 * ((g_new - mu) ** 2 - (g - mu) ** 2) / sigma**2

    states = list(_enumerate_compositions(total, T))
    state_idx = {s: i for i, s in enumerate(states)}
    logps = np.array(
        [
            float(
                a_fn(
                    jnp.zeros((1, T, 3), jnp.float64)
                    .at[0, :, 0]
                    .set(jnp.asarray(np.array(s), jnp.float64))
                )
            )
            for s in states
        ]
    )
    target = np.exp(logps - logps.max())
    target /= target.sum()

    init = jnp.zeros((1, T, 3), jnp.float64).at[0, :, 0].set(
        jnp.asarray(np.array(states[0]), jnp.float64)
    )
    # consistent state: E_t = sum_{s<t} c_s (S gets the negative)
    st0 = jnp.zeros((1, T, 4), jnp.float64)
    c0 = np.array(states[0], float)
    for t in range(T):
        st0 = st0.at[0, t, 1].set(float((c0 * (t > np.arange(T))).sum()))
        st0 = st0.at[0, t, 0].set(-float((c0 * (t > np.arange(T))).sum()))

    g0 = jnp.asarray(float(mu_fn(init)), jnp.float64)
    lp0 = full_logp(g0, init)

    def body(carry, key):
        ev, st, lp, g = carry
        k1, k2, k3 = jax.random.split(key, 3)
        evaluator = FullEvaluator(logp_fn=lambda e: full_logp(g, e))
        ev, st, lp, g, _ = compensated_move_step(
            k1, ev, st, lp, evaluator, g, potential, gamma_delta, 0,
            dmax=3, mmax=1, nmax=2, move_decay=0.9, x_decay=0.8,
        )
        g_prop = g + 0.5 * jax.random.normal(k2, (), jnp.float64)
        dlp = full_logp(g_prop, ev) - full_logp(g, ev)
        acc = jnp.log(jax.random.uniform(k3, (), jnp.float64)) < dlp
        g = jnp.where(acc, g_prop, g)
        lp = jnp.where(acc, lp + dlp, lp)
        return (ev, st, lp, g), (ev[0, :, 0], g)

    n = 60000
    keys = jax.random.split(jax.random.PRNGKey(21), n)
    (ev_f, st_f, lp_f, g_f), (trace_e, trace_g) = jax.lax.scan(
        body, (init, st0, lp0, g0), keys
    )
    # (3) delta accounting is exact
    np.testing.assert_allclose(
        float(lp_f), float(full_logp(g_f, ev_f)), rtol=1e-9, atol=1e-9
    )
    trace_e = np.asarray(trace_e[5000:]).astype(int)
    trace_g = np.asarray(trace_g[5000:])

    counts = np.zeros(len(states))
    mus = trace_e @ np.asarray(coef).astype(float)
    for row in trace_e:
        counts[state_idx[tuple(row)]] += 1
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - target).sum()
    assert tv < 0.03, (tv, freq, target)
    # (2) residual is N(0, sigma^2)
    resid = trace_g - mus
    assert abs(resid.mean()) < 0.02, resid.mean()
    np.testing.assert_allclose(resid.std(), sigma, rtol=0.05)


def test_gibbs_step_compensated_logp_consistency(rng):
    """The production Gibbs step with compensate_gamma0=True keeps the
    threaded logp exactly consistent with a full recompute (exercises the
    rate_ir context refresh, the u[3] write-back, and the windowed
    I->R/gamma0 delta accounting end to end)."""
    from covid19uk_tpu.inference.gibbs import (
        ChainState, EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from covid19uk_tpu.models.spec import CovidUK, pack_parameters, unconstrain_parameters
    from tests.test_spec import make_test_data, make_test_params

    M, T = 5, 14
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60, np.full(M, 25.0), np.full(M, 35.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(13), params)

    u0 = unconstrain_parameters(pack_parameters(params))
    state = ChainState(u=u0, events=events)
    cfg = EventKernelConfig(
        dmax=6, mmax=2, nmax=8, occult_nmax=4,
        num_event_time_updates=3, t_range=(T - 7, T),
        compensate_gamma0=True,
        # >1 exercises the live-rate refresh across repeated proposals
        num_compensated_updates=2,
    )
    step = make_mcmc_step(model, 4, cfg)
    tune = HMCTunables(
        step_size=jnp.asarray(0.001, jnp.float64),
        inv_mass_diag=jnp.ones_like(u0),
    )

    def body(carry, key):
        st = carry
        st, trace = step(key, st, tune)
        return st, (trace.comp_ei.is_accepted, trace.comp_ei.target_log_prob)

    keys = jax.random.split(jax.random.PRNGKey(14), 120)
    final, (acc, lps) = jax.lax.scan(body, state, keys)

    # the compensated kernel must actually move
    assert np.asarray(acc).mean() > 0.02
    # gamma0 must have moved from its initial value
    assert abs(float(final.u[3] - u0[3])) > 1e-6
    # threaded logp after the last sweep == full joint at the final state
    lp_recomputed = model.joint_log_prob_unconstrained(
        final.u, final.events
    )
    np.testing.assert_allclose(
        float(lps[-1]), float(lp_recomputed), rtol=1e-8, atol=1e-6
    )


# ------------------------------------------------ pair-move (episode) kernel


@pytest.mark.parametrize("move_decay,x_decay", [(0.9, 0.8), (1.0, 1.0)])
def test_pair_move_kernel_exact_stationarity(move_decay, x_decay):
    """The (S->E, E->I) episode-translation kernel preserves an enumerable
    target exactly — composed with the plain single-transition moves for
    ergodicity (pair moves conserve sum_t t*(c1 - c0) on their own).

    M=1, T=4, 2 events of each type => 10 x 10 = 100 states.
    """
    from covid19uk_tpu.inference.event_kernels import pair_move_step

    T, tot0, tot1 = 4, 2, 2
    w0 = jnp.asarray(np.array([0.3, 0.9, -0.4, 0.5]), jnp.float64)
    w1 = jnp.asarray(np.array([-0.2, 0.6, 0.8, -0.3]), jnp.float64)

    def logp_fn(events):
        c0, c1 = events[0, :, 0], events[0, :, 1]
        return (
            jnp.sum(c0 * w0) + jnp.sum(c1 * w1)
            - 0.1 * jnp.sum(c0**2) - 0.12 * jnp.sum(c1**2)
            + 0.05 * jnp.sum(c0 * c1)
        )

    s0 = list(_enumerate_compositions(tot0, T))
    s1 = list(_enumerate_compositions(tot1, T))
    states = [(a, b) for a in s0 for b in s1]
    idx = {s: i for i, s in enumerate(states)}

    def mk(a, b):
        ev = jnp.zeros((1, T, 3), jnp.float64)
        ev = ev.at[0, :, 0].set(jnp.asarray(np.array(a), jnp.float64))
        ev = ev.at[0, :, 1].set(jnp.asarray(np.array(b), jnp.float64))
        return ev

    logps = np.array([float(logp_fn(mk(a, b))) for a, b in states])
    target = np.exp(logps - logps.max())
    target /= target.sum()

    init = mk(*states[0])
    ev = FullEvaluator(logp_fn=logp_fn)
    st0 = jnp.zeros((1, T, 4), jnp.float64)

    def body(carry, key):
        events, st, lp = carry
        k1, k2, k3 = jax.random.split(key, 3)
        events, st, lp, _ = pair_move_step(
            k1, events, st, lp, ev, dmax=3, mmax=1, nmax=2,
            move_decay=move_decay, x_decay=x_decay,
        )
        events, st, lp, _ = event_move_step(
            k2, events, st, lp, ev, 0, dmax=3, mmax=1, nmax=2,
            move_decay=move_decay, x_decay=x_decay,
        )
        events, st, lp, _ = event_move_step(
            k3, events, st, lp, ev, 1, dmax=3, mmax=1, nmax=2,
            move_decay=move_decay, x_decay=x_decay,
        )
        return (events, st, lp), (events[0, :, 0], events[0, :, 1])

    n = 80000
    keys = jax.random.split(jax.random.PRNGKey(31), n)
    (ev_f, _, lp_f), (tr0, tr1) = jax.lax.scan(
        body, (init, st0, logp_fn(init)), keys
    )
    # delta accounting is exact
    np.testing.assert_allclose(
        float(lp_f), float(logp_fn(ev_f)), rtol=1e-9, atol=1e-9
    )
    tr0 = np.asarray(tr0[8000:]).astype(int)
    tr1 = np.asarray(tr1[8000:]).astype(int)

    counts = np.zeros(len(states))
    for a, b in zip(tr0, tr1):
        counts[idx[(tuple(a), tuple(b))]] += 1
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - target).sum()
    assert tv < 0.04, (tv,)


def test_pair_move_conserves_totals_on_real_model(rng):
    """Pair moves on the real model: per-type totals conserved, I->R
    untouched, state stays valid, threaded logp stays consistent."""
    from covid19uk_tpu.inference.event_kernels import pair_move_step
    from covid19uk_tpu.models import seir
    from covid19uk_tpu.models.spec import CovidUK
    from tests.test_spec import make_test_data, make_test_params

    M, T = 5, 12
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 50, np.full(M, 20.0), np.full(M, 30.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(15), params)

    logp_fn = lambda ev: model.log_prob(params, ev)
    logp = logp_fn(events)
    fe = FullEvaluator(logp_fn=logp_fn)
    st0 = seir.compute_state(model.initial_state, events)

    def body(carry, key):
        ev, st, lp = carry
        ev, st, lp, info = pair_move_step(key, ev, st, lp, fe, 5, 2, 10)
        return (ev, st, lp), info.is_accepted

    keys = jax.random.split(jax.random.PRNGKey(16), 300)
    (ev_out, st_out, lp_out), acc = jax.lax.scan(
        body, (events, st0, logp), keys
    )

    ev0, ev1 = np.asarray(events), np.asarray(ev_out)
    np.testing.assert_array_equal(ev0[..., 2], ev1[..., 2])
    np.testing.assert_allclose(ev0[..., 0].sum(), ev1[..., 0].sum())
    np.testing.assert_allclose(ev0[..., 1].sum(), ev1[..., 1].sum())
    state = np.asarray(seir.compute_state(model.initial_state, ev_out))
    assert state.min() >= 0
    np.testing.assert_allclose(np.asarray(st_out), state, rtol=1e-12)
    np.testing.assert_allclose(
        float(lp_out), float(logp_fn(ev_out)), rtol=1e-9
    )
    assert np.asarray(acc).mean() > 0.02  # the kernel moves


def test_threaded_commute_matches_full(rng):
    """The production fast path — a per-draw commute threaded through every
    kernel (sliced by the windowed deltas, rank-1-updated on apply/revert) —
    must produce the same chains as full re-evaluation, and the threaded
    commute must stay consistent with the state (gibbs.py recomputes it
    each draw; within a draw it evolves incrementally)."""
    from covid19uk_tpu.inference.event_kernels import pair_move_step
    from covid19uk_tpu.models.spec import CovidUK
    from covid19uk_tpu.models import seir
    from tests.test_spec import make_test_data, make_test_params

    M, T = 6, 16
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60, np.full(M, 25.0), np.full(M, 35.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(8), params)
    st0 = seir.compute_state(model.initial_state, events)
    cm0 = model.commute_pressure(st0[..., 2])

    logp_fn = lambda ev: model.log_prob(params, ev)
    logp = logp_fn(events)
    fe = FullEvaluator(logp_fn=logp_fn)
    ctx = make_context(model, params)
    t_range = (T - 6, T)
    we_move = WindowedEvaluator(ctx=ctx, window=min(5 + 1, T))
    we_occ = WindowedEvaluator(ctx=ctx, window=T - t_range[0])

    def full_chain():
        def body(carry, key):
            ev, st, lp = carry
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            ev, st, lp, i1 = event_move_step(k1, ev, st, lp, fe, 0, 5, 2, 10)
            ev, st, lp, i2 = event_move_step(k2, ev, st, lp, fe, 1, 5, 2, 10)
            ev, st, lp, i3 = occult_step(k3, ev, st, lp, fe, 0, t_range, 5)
            ev, st, lp, i4 = occult_step(k4, ev, st, lp, fe, 1, t_range, 5)
            ev, st, lp, i5 = pair_move_step(k5, ev, st, lp, fe, 5, 2, 10)
            acc = jnp.stack([i.is_accepted for i in (i1, i2, i3, i4, i5)])
            return (ev, st, lp), (lp, acc)

        keys = jax.random.split(jax.random.PRNGKey(9), 300)
        return jax.lax.scan(body, (events, st0, logp), keys)

    def threaded_chain():
        def body(carry, key):
            ev, st, cm, lp = carry
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            ev, st, cm, lp, i1 = event_move_step(
                k1, ev, st, lp, we_move, 0, 5, 2, 10, commute=cm
            )
            ev, st, cm, lp, i2 = event_move_step(
                k2, ev, st, lp, we_move, 1, 5, 2, 10, commute=cm
            )
            ev, st, cm, lp, i3 = occult_step(
                k3, ev, st, lp, we_occ, 0, t_range, 5, commute=cm
            )
            ev, st, cm, lp, i4 = occult_step(
                k4, ev, st, lp, we_occ, 1, t_range, 5, commute=cm
            )
            ev, st, cm, lp, i5 = pair_move_step(
                k5, ev, st, lp, we_move, 5, 2, 10, commute=cm
            )
            acc = jnp.stack([i.is_accepted for i in (i1, i2, i3, i4, i5)])
            return (ev, st, cm, lp), (lp, acc)

        keys = jax.random.split(jax.random.PRNGKey(9), 300)
        return jax.lax.scan(body, (events, st0, cm0, logp), keys)

    (ev_f, _, lp_f), (lps_f, acc_f) = full_chain()
    (ev_w, st_w, cm_w, lp_w), (lps_w, acc_w) = threaded_chain()

    np.testing.assert_array_equal(np.asarray(acc_f), np.asarray(acc_w))
    np.testing.assert_array_equal(np.asarray(ev_f), np.asarray(ev_w))
    np.testing.assert_allclose(
        np.asarray(lps_f), np.asarray(lps_w), rtol=1e-9, atol=1e-7
    )
    # the threaded commute stays consistent with the threaded state
    cm_re = model.commute_pressure(st_w[..., 2])
    np.testing.assert_allclose(
        np.asarray(cm_w), np.asarray(cm_re), rtol=1e-8, atol=1e-10
    )
    assert np.asarray(acc_f).mean(0).min() > 0.01


def test_gibbs_step_threading_parity(rng):
    """make_mcmc_step with thread_commute forced on vs off: identical
    chains from identical keys (the auto gate only picks the faster of two
    equivalent programs)."""
    from covid19uk_tpu.inference.gibbs import (
        ChainState, EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from covid19uk_tpu.models.spec import CovidUK
    from covid19uk_tpu.models import seir
    from tests.test_spec import make_test_data, make_test_params

    M, T = 5, 14
    data = make_test_data(rng, M, T)
    params = make_test_params(rng, M, T)
    N = np.asarray(data.N)
    init = np.stack(
        [N - 60, np.full(M, 25.0), np.full(M, 35.0), np.zeros(M)], -1
    )
    model = CovidUK(data, jnp.asarray(init, jnp.float64), 0, T)
    events = model.sample_seir(jax.random.PRNGKey(3), params)
    from covid19uk_tpu.models.spec import pack_parameters, \
        unconstrain_parameters

    u0 = unconstrain_parameters(pack_parameters(params))
    state0 = ChainState(u=u0, events=events)
    tune = HMCTunables(
        step_size=jnp.asarray(0.01, jnp.float64),
        inv_mass_diag=jnp.ones_like(u0),
    )
    base = dict(dmax=5, mmax=2, nmax=10, occult_nmax=5,
                num_event_time_updates=3, t_range=(T - 5, T),
                num_pair_updates=1)
    outs = []
    keys = jax.random.split(jax.random.PRNGKey(11), 30)
    for tc in (True, False):
        step = make_mcmc_step(
            model, 4, EventKernelConfig(**base, thread_commute=tc)
        )

        @jax.jit
        def chain(st):
            def body(st, k):
                st, _ = step(k, st, tune)
                return st, None

            return jax.lax.scan(body, st, keys)[0]

        outs.append(chain(state0))
    np.testing.assert_array_equal(
        np.asarray(outs[0].events), np.asarray(outs[1].events)
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].u), np.asarray(outs[1].u), rtol=1e-9
    )


def test_compensated_pair_kernel_exact_stationarity():
    """The (gamma0, episode-translation) joint kernel preserves an
    enumerable-events x Gaussian-gamma target exactly.

    Target: pi(g, a, b) = pi_e(a, b) * N(g; mu(b), sigma^2) with mu the
    same I-column potential the kernel compensates along (only E->I times
    move I).  Composed with the plain per-transition moves (event
    ergodicity) and a random-walk MH on g (gamma ergodicity); the
    compensated-pair kernel conserves g + potential(state) on its own.
    """
    from covid19uk_tpu.inference.event_kernels import (
        compensated_pair_move_step,
    )

    T, tot0, tot1 = 4, 2, 2
    sigma = 0.5
    w0 = jnp.asarray(np.array([0.3, 0.9, -0.4, 0.5]), jnp.float64)
    w1 = jnp.asarray(np.array([-0.2, 0.6, 0.8, -0.3]), jnp.float64)
    coef = 0.05 * jnp.asarray(np.arange(T - 1, -1, -1), jnp.float64)

    def a_fn(events):
        c0, c1 = events[0, :, 0], events[0, :, 1]
        return (
            jnp.sum(c0 * w0) + jnp.sum(c1 * w1)
            - 0.1 * jnp.sum(c0**2) - 0.12 * jnp.sum(c1**2)
            + 0.05 * jnp.sum(c0 * c1)
        )

    def mu_fn(events):
        return jnp.sum(events[0, :, 1] * coef)

    def full_logp(g, events):
        return a_fn(events) - 0.5 * ((g - mu_fn(events)) / sigma) ** 2

    def potential(st):
        # STOICH[1] = E->I: I_t = sum_s c1_s [t > s]; matches mu_fn
        return 0.05 * jnp.sum(st[0, :, 2])

    def gamma_delta(ev_new, st_new, g, g_new):
        mu = 0.05 * jnp.sum(st_new[0, :, 2])
        return -0.5 * ((g_new - mu) ** 2 - (g - mu) ** 2) / sigma**2

    s0 = list(_enumerate_compositions(tot0, T))
    s1 = list(_enumerate_compositions(tot1, T))
    states = [(a, b) for a in s0 for b in s1]
    idx = {s: i for i, s in enumerate(states)}

    def mk(a, b):
        ev = jnp.zeros((1, T, 3), jnp.float64)
        ev = ev.at[0, :, 0].set(jnp.asarray(np.array(a), jnp.float64))
        ev = ev.at[0, :, 1].set(jnp.asarray(np.array(b), jnp.float64))
        return ev

    logps = np.array([float(a_fn(mk(a, b))) for a, b in states])
    target = np.exp(logps - logps.max())
    target /= target.sum()

    init = mk(*states[0])
    # consistent state for the compensating potential: track E and I
    a0, b0 = np.array(states[0][0], float), np.array(states[0][1], float)
    st0 = jnp.zeros((1, T, 4), jnp.float64)
    for t in range(T):
        e_t = float((a0 * (t > np.arange(T))).sum()) - float(
            (b0 * (t > np.arange(T))).sum()
        )
        i_t = float((b0 * (t > np.arange(T))).sum())
        st0 = st0.at[0, t, 1].set(e_t).at[0, t, 2].set(i_t)

    g0 = jnp.asarray(float(mu_fn(init)), jnp.float64)
    lp0 = full_logp(g0, init)

    def body(carry, key):
        ev, st, lp, g = carry
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        evaluator = FullEvaluator(logp_fn=lambda e: full_logp(g, e))
        ev, st, lp, g, _ = compensated_pair_move_step(
            k1, ev, st, lp, evaluator, g, potential, gamma_delta,
            dmax=3, mmax=1, nmax=2, move_decay=0.9, x_decay=0.8,
        )
        evaluator = FullEvaluator(logp_fn=lambda e: full_logp(g, e))
        ev, st, lp, _ = event_move_step(
            k2, ev, st, lp, evaluator, 0, dmax=3, mmax=1, nmax=2,
            move_decay=0.9, x_decay=0.8,
        )
        ev, st, lp, _ = event_move_step(
            k3, ev, st, lp, evaluator, 1, dmax=3, mmax=1, nmax=2,
            move_decay=0.9, x_decay=0.8,
        )
        g_prop = g + 0.5 * jax.random.normal(k4, (), jnp.float64)
        dlp = full_logp(g_prop, ev) - full_logp(g, ev)
        acc = jnp.log(jax.random.uniform(k5, (), jnp.float64)) < dlp
        g = jnp.where(acc, g_prop, g)
        lp = jnp.where(acc, lp + dlp, lp)
        return (ev, st, lp, g), (ev[0, :, 0], ev[0, :, 1], g)

    n = 80000
    keys = jax.random.split(jax.random.PRNGKey(33), n)
    (ev_f, st_f, lp_f, g_f), (tr0, tr1, trg) = jax.lax.scan(
        body, (init, st0, lp0, g0), keys
    )
    # delta accounting is exact
    np.testing.assert_allclose(
        float(lp_f), float(full_logp(g_f, ev_f)), rtol=1e-9, atol=1e-9
    )
    tr0 = np.asarray(tr0[8000:]).astype(int)
    tr1 = np.asarray(tr1[8000:]).astype(int)
    trg = np.asarray(trg[8000:])

    counts = np.zeros(len(states))
    for a, b in zip(tr0, tr1):
        counts[idx[(tuple(a), tuple(b))]] += 1
    freq = counts / counts.sum()
    tv = 0.5 * np.abs(freq - target).sum()
    assert tv < 0.04, (tv,)
    # the gamma residual is N(0, sigma^2)
    mus = tr1 @ np.asarray(coef).astype(float)
    resid = trg - mus
    assert abs(resid.mean()) < 0.03, resid.mean()
    np.testing.assert_allclose(resid.std(), sigma, rtol=0.05)
