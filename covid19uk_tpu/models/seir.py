"""Discrete-time chain-binomial state-transition process, TPU-native.

Replaces ``gemlib.distributions.DiscreteTimeStateTransitionModel`` and
``gemlib.util.compute_state`` (behavioral contract per call sites in
``/root/reference/covid19uk/model_spec.py:278-285`` and
``/root/reference/covid19uk/inference/inference.py:500-510``, math spec in
``/root/reference/doc/lancs_space_model_concept.tex:248-279``).

TPU-first design notes
----------------------
The reference evaluates the likelihood by scanning over time.  But the
chain-binomial log-density *factorizes over time* once the state timeseries is
known, and the state is an (exclusive) cumulative sum of events — a parallel
prefix operation XLA executes in O(log T) depth.  So ``log_prob`` here is:

    state  = initial_state + exclusive_cumsum_t(events @ stoichiometry)
    rates  = rate_fn(all_t, state)        # batched; one [M,M]@[M,T] MXU matmul
    logp   = sum binomial_log_pmf(src_state, events, rates * dt)

— fully parallel over the T axis, which makes 16-leapfrog HMC gradients a
stack of matmuls instead of a differentiated sequential scan.  Only
``chain_binomial_sample`` (forward simulation) is a true ``lax.scan``, because
sampled events feed back into the state.

Event tensor layout (matches reference): ``events[M, T, X]`` with X=3
transitions (0: S->E, 1: E->I, 2: I->R); ``STOICHIOMETRY[X, S]`` with S=4
states (S, E, I, R) — see ``model_spec.py:24``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from covid19uk_tpu.ops.binomial import binomial_log_pmf_from_rate

# Reference: /root/reference/covid19uk/model_spec.py:24-26
STOICHIOMETRY = np.array(
    [[-1, 1, 0, 0], [0, -1, 1, 0], [0, 0, -1, 1]], dtype=np.float32
)
TIME_DELTA = 1.0
NU = 0.28  # E->I rate, fixed (code value; concept doc says 0.5 — code wins)

# Transition -> source-state index: S->E draws from S(0), E->I from E(1),
# I->R from I(2).
SOURCE_STATES = np.array([0, 1, 2])


def compute_state(initial_state, events, stoichiometry=None):
    """State timeseries implied by an event tensor.

    ``state[..., m, t, s] = initial_state[..., m, s]
                            + sum_{t' < t} events[..., m, t', x] S[x, s]``

    (exclusive cumulative sum: ``state[..., 0, :] == initial_state``).
    Broadcasts over arbitrary leading batch/chain/sample axes, matching
    ``gemlib.util.compute_state`` usage at
    ``/root/reference/covid19uk/inference/inference.py:500-510`` and
    ``/root/reference/covid19uk/posterior/*.py``.

    Args:
      initial_state: ``[..., M, S]`` state at the first time point.
      events: ``[..., M, T, X]`` transition-event counts.
      stoichiometry: ``[X, S]``; defaults to the SEIR ``STOICHIOMETRY``.

    Returns:
      ``[..., M, T, S]`` state timeseries.
    """
    if stoichiometry is None:
        stoichiometry = STOICHIOMETRY
    dtype = jnp.result_type(initial_state, events)
    events = jnp.asarray(events, dtype)
    stoich = jnp.asarray(stoichiometry, dtype)
    deltas = jnp.einsum("...mtx,xs->...mts", events, stoich)
    cum = jnp.cumsum(deltas, axis=-2)
    # exclusive: shift right by one along t
    cum = jnp.concatenate(
        [jnp.zeros_like(cum[..., :1, :]), cum[..., :-1, :]], axis=-2
    )
    return jnp.asarray(initial_state, dtype)[..., :, None, :] + cum


def transition_source_counts(initial_state, events, stoichiometry=None):
    """Source-compartment counts ``n[..., m, t, x]`` for each transition.

    For SEIR with the default stoichiometry this is ``state[..., (0,1,2)]``:
    the binomial trial counts for S->E, E->I, I->R at each (m, t).
    """
    state = compute_state(initial_state, events, stoichiometry)
    return state[..., SOURCE_STATES]


def chain_binomial_log_prob(
    events, rates, initial_state, stoichiometry=None, time_delta=TIME_DELTA
):
    """Log-density of an event tensor under the chain-binomial process.

    ``sum_{m,t,x} Binomial(n=src_state[m,t,x], p=1-exp(-rates[m,t,x]*dt))
                  .log_prob(events[m,t,x])``

    Returns -inf whenever the event tensor is inconsistent with a valid
    counting process (negative compartments / events exceeding the source
    state), which is how event-move MH proposals are rejected-by-density.

    Args:
      events: ``[..., M, T, X]``.
      rates: ``[..., M, T, X]`` per-transition rates evaluated at the state
        implied by ``events`` (use :func:`transition_source_counts` /
        the model's batched rate function).
      initial_state: ``[..., M, S]``.

    Returns:
      scalar (or batch of scalars) log-density.
    """
    n = transition_source_counts(initial_state, events, stoichiometry)
    logpmf = binomial_log_pmf_from_rate(n, events, rates * time_delta)
    return jnp.sum(logpmf, axis=(-3, -2, -1))


def chain_binomial_sample(
    key,
    rate_fn,
    initial_state,
    initial_step,
    num_steps,
    stoichiometry=None,
    time_delta=TIME_DELTA,
):
    """Forward-simulates the chain-binomial process (``model.sample``).

    Reference contract: ``gemlib.DiscreteTimeStateTransitionModel.sample``
    used at ``/root/reference/covid19uk/posterior/predict.py:63-64``.

    Args:
      key: PRNG key.
      rate_fn: ``rate_fn(t, state[M,S]) -> rates[M,X]`` — per-step transition
        rates; ``t`` is the absolute time index (initial_step + offset).
      initial_state: ``[M, S]`` floats.
      initial_step: int, absolute index of the first simulated day.
      num_steps: T, number of steps.

    Returns:
      events ``[M, T, X]``.
    """
    if stoichiometry is None:
        stoichiometry = STOICHIOMETRY
    dtype = jnp.result_type(initial_state)
    stoich = jnp.asarray(stoichiometry, dtype)
    keys = jax.random.split(key, num_steps)
    ts = initial_step + jnp.arange(num_steps)

    def step(state, inputs):
        t, k = inputs
        rates = rate_fn(t, state)  # [M, X]
        n = state[:, SOURCE_STATES]  # [M, X]
        p = -jnp.expm1(-rates * time_delta)
        draws = jax.random.binomial(k, n=n, p=p, dtype=dtype)
        new_state = state + draws @ stoich
        return new_state, draws

    _, events = jax.lax.scan(step, jnp.asarray(initial_state, dtype), (ts, keys))
    return jnp.transpose(events, (1, 0, 2))  # [T,M,X] -> [M,T,X]
