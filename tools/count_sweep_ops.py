"""Counts sequential HLO ops in the compiled UK-scale step program.

docs/profile_uk.md attributes ~0.76 ms per event-kernel application to
launch serialization (vs ~25 us of HBM time for its bytes).  This tool
makes the launch chain visible: it compiles the TIMED-phase step
(16 leapfrogs + 5x multiscan of 4 event kernels, C chains vmapped) and
prints per-opcode instruction counts of the optimized HLO's entry (and
the while-body of the multiscan), so op-count reductions can be measured
without a TPU session.

Usage: python tools/count_sweep_ops.py [--chains 64] [--platform cpu|axon]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, T = 380, 120


def main(chains, platform, updates):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from covid19uk_tpu.inference.gibbs import (
        ChainState,
        EventKernelConfig,
        HMCTunables,
        make_mcmc_step,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    dtype = jnp.float32
    model = build_synthetic_model(M, T, dtype)
    single = initial_chain_state(model)
    u = jnp.broadcast_to(single.u, (chains,) + single.u.shape)
    state = ChainState(
        u=u,
        events=jnp.broadcast_to(
            single.events, (chains,) + single.events.shape
        ),
    )
    P = u.shape[-1]
    tune = HMCTunables(
        step_size=jnp.full((chains,), 0.001, dtype),
        inv_mass_diag=jnp.ones((chains, P), dtype),
    )
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=updates, t_range=(T - 21, T),
        num_pair_updates=0,
    )
    step = make_mcmc_step(model, 16, cfg)
    fn = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, None)))
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    compiled = fn.lower(keys, state, tune, model).compile()
    hlo = compiled.as_text()

    # Per-computation opcode histogram.  Optimized HLO formats one
    # instruction per line: "  %name = type opcode(...)" or
    # "  ROOT %name = ...".
    comps = {}
    cur = None
    for line in hlo.splitlines():
        mcomp = re.match(r"(?:ENTRY )?%?([\w\.\-]+) \(.*\) -> ", line)
        if mcomp:
            cur = mcomp.group(1)
            comps[cur] = collections.Counter()
            continue
        minst = re.match(r"\s+(?:ROOT )?[%\w\.\-]+ = \S+ ([\w\-]+)\(", line)
        if minst and cur:
            comps[cur][minst.group(1)] += 1

    total = collections.Counter()
    for c in comps.values():
        total.update(c)
    # The multiscan while-body is where the per-draw launch chain lives.
    body = sorted(comps.items(), key=lambda kv: -sum(kv[1].values()))
    print(f"platform={jax.devices()[0].platform} computations={len(comps)} "
          f"total_instructions={sum(total.values())}")
    for name, cnt in body[:4]:
        n = sum(cnt.values())
        top = ", ".join(f"{k}:{v}" for k, v in cnt.most_common(12))
        print(f"  {name}: {n} instrs | {top}")
    top = ", ".join(f"{k}:{v}" for k, v in total.most_common(16))
    print(f"  ALL: {top}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--platform", default=None)
    p.add_argument("--updates", type=int, default=5)
    main(**vars(p.parse_args()))
