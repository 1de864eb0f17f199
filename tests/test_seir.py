"""Exact-value tests for compute_state and the chain-binomial process."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from covid19uk_tpu.models import seir


def _random_valid_events(rng, M=3, T=6, pop=100):
    """Simulates a small SEIR forward in numpy to get a valid event tensor."""
    state = np.zeros((M, 4))
    state[:, 0] = pop - 10
    state[:, 1] = 4
    state[:, 2] = 6
    events = np.zeros((M, T, 3))
    for t in range(T):
        for m in range(M):
            y_se = rng.binomial(int(state[m, 0]), 0.05)
            y_ei = rng.binomial(int(state[m, 1]), 0.3)
            y_ir = rng.binomial(int(state[m, 2]), 0.2)
            events[m, t] = [y_se, y_ei, y_ir]
            state[m] += np.array([-y_se, y_se - y_ei, y_ei - y_ir, y_ir])
    return events


def test_compute_state_exclusive_cumsum(rng):
    M, T = 3, 6
    init = np.array([[90.0, 4.0, 6.0, 0.0]] * M)
    events = _random_valid_events(rng, M, T)
    state = np.asarray(seir.compute_state(jnp.float64(init), jnp.float64(events)))
    # t=0 equals initial state
    np.testing.assert_array_equal(state[:, 0, :], init)
    # manual propagation
    expect = init.copy()
    for t in range(1, T):
        y = events[:, t - 1, :]
        expect = expect + y @ np.array(
            [[-1, 1, 0, 0], [0, -1, 1, 0], [0, 0, -1, 1]], dtype=float
        )
        np.testing.assert_allclose(state[:, t, :], expect)
    # conservation: row sums constant
    np.testing.assert_allclose(state.sum(-1), state.sum(-1)[:, :1].repeat(T, 1))


def test_compute_state_batched(rng):
    """Broadcasts over a leading sample axis (posterior usage)."""
    M, T, B = 3, 6, 4
    init = np.array([[90.0, 4.0, 6.0, 0.0]] * M)
    events = np.stack([_random_valid_events(rng, M, T) for _ in range(B)])
    batched = np.asarray(
        seir.compute_state(jnp.float64(init), jnp.float64(events))
    )
    for b in range(B):
        single = np.asarray(
            seir.compute_state(jnp.float64(init), jnp.float64(events[b]))
        )
        np.testing.assert_allclose(batched[b], single)


def test_chain_binomial_log_prob_matches_hand_computed(rng):
    M, T = 3, 6
    init = np.array([[90.0, 4.0, 6.0, 0.0]] * M)
    events = _random_valid_events(rng, M, T)
    rates = rng.uniform(0.01, 0.5, size=(M, T, 3))

    got = float(
        seir.chain_binomial_log_prob(
            jnp.float64(events), jnp.float64(rates), jnp.float64(init)
        )
    )

    state = np.asarray(
        seir.compute_state(jnp.float64(init), jnp.float64(events))
    )
    want = 0.0
    for m in range(M):
        for t in range(T):
            for x, src in enumerate([0, 1, 2]):
                n = state[m, t, src]
                k = events[m, t, x]
                p = 1.0 - np.exp(-rates[m, t, x])
                want += stats.binom.logpmf(k, n, p)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_chain_binomial_log_prob_invalid_events_neg_inf(rng):
    M, T = 3, 6
    init = np.array([[90.0, 4.0, 6.0, 0.0]] * M)
    events = _random_valid_events(rng, M, T)
    rates = np.full((M, T, 3), 0.1)
    # more E->I events than E present => negative compartment => -inf
    bad = events.copy()
    bad[0, 0, 1] = 1000.0
    got = float(
        seir.chain_binomial_log_prob(
            jnp.float64(bad), jnp.float64(rates), jnp.float64(init)
        )
    )
    assert np.isneginf(got)


def test_chain_binomial_sample_consistency():
    """Sampled events must be consistent (valid counting process) and the
    sampler must be reproducible given the key."""
    M, T = 4, 20
    init = jnp.asarray(
        np.array([[1000.0, 10.0, 5.0, 0.0]] * M), jnp.float64
    )

    def rate_fn(t, state):
        se = 0.4 * state[:, 2] / 1015.0 + 1e-9
        ei = jnp.full((M,), 0.3)
        ir = jnp.full((M,), 0.2)
        return jnp.stack([se, ei, ir], axis=-1)

    key = jax.random.PRNGKey(0)
    ev1 = seir.chain_binomial_sample(key, rate_fn, init, 0, T)
    ev2 = seir.chain_binomial_sample(key, rate_fn, init, 0, T)
    np.testing.assert_array_equal(np.asarray(ev1), np.asarray(ev2))
    assert ev1.shape == (M, T, 3)
    state = seir.compute_state(init, ev1)
    assert np.all(np.asarray(state) >= 0)
    # events never exceed source compartment
    n = np.asarray(state)[:, :, :3]
    assert np.all(np.asarray(ev1) <= n + 1e-9)
    # log_prob of own sample is finite
    full_state = seir.compute_state(init, ev1)
    rates = jax.vmap(rate_fn, in_axes=(0, 1), out_axes=1)(
        jnp.arange(T), full_state
    )
    lp = seir.chain_binomial_log_prob(ev1, rates, init)
    assert np.isfinite(float(lp))


def test_log_prob_gradient_wrt_rates_finite(rng):
    M, T = 3, 6
    init = np.array([[90.0, 4.0, 6.0, 0.0]] * M)
    events = _random_valid_events(rng, M, T)
    rates = jnp.float64(rng.uniform(0.01, 0.5, size=(M, T, 3)))

    g = jax.grad(
        lambda r: seir.chain_binomial_log_prob(
            jnp.float64(events), r, jnp.float64(init)
        )
    )(rates)
    assert np.all(np.isfinite(np.asarray(g)))
