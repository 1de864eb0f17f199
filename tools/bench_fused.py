"""Same-session A/B: fused Pallas sweep vs XLA sweep, ms/step at UK scale.

    python tools/bench_fused.py [--chains 64] [--draws 50] [--reps 3]
        [--pair 1] [--leapfrog 16]

Times the full MCMC step (HMC + event sweep) under both
``fused_sweep="never"`` and ``"always"`` on identical synthetic full-UK
inputs (M=380, T=120), same keys, interleaved reps — remote-tunnel walls
vary between sessions, so only the in-session ratio is meaningful.
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

M, T = 380, 120


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--draws", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pair", type=int, default=1)
    ap.add_argument("--leapfrog", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference.gibbs import (
        EventKernelConfig, HMCTunables, make_mcmc_step,
    )
    from bench import build

    model, _, _, state = build(args.chains)
    C = args.chains
    cfg = EventKernelConfig(
        dmax=84, mmax=2, nmax=25, occult_nmax=15,
        num_event_time_updates=5, t_range=(T - 21, T),
        num_pair_updates=args.pair,
        thread_commute="always",
    )
    tune = HMCTunables(
        step_size=jnp.asarray(1e-3, jnp.float32),
        inv_mass_diag=jnp.ones_like(state.u[0]),
    )

    def runner(c):
        step = make_mcmc_step(model, args.leapfrog, c)

        def seg(keys, st):
            def body(st, k):
                st, tr = step(k, st, tune, model)
                return st, tr.move_se.is_accepted

            st, acc = jax.lax.scan(body, st, keys)
            return st, acc

        return jax.jit(jax.vmap(seg, in_axes=(0, 0)))

    out = {}
    walls = {"xla": [], "fused": []}
    accs = {}
    st = {"xla": state, "fused": state}
    fns = {
        "xla": runner(cfg),
        "fused": runner(cfg._replace(fused_sweep="always")),
    }
    key = jax.random.PRNGKey(0)
    # compile both first
    for name, fn in fns.items():
        t0 = time.time()
        keys = jax.random.split(key, C * args.draws).reshape(
            C, args.draws, 2
        )
        s, acc = fn(keys, st[name])
        jax.block_until_ready(s.u)
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        st[name] = s
    # interleaved timed reps
    for r in range(args.reps):
        for name, fn in fns.items():
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, C * args.draws).reshape(
                C, args.draws, 2
            )
            t0 = time.time()
            s, acc = fn(keys, st[name])
            jax.block_until_ready(s.u)
            w = time.time() - t0
            walls[name].append(w)
            st[name] = s
            accs[name] = float(jnp.mean(acc))
            print(
                f"rep {r} {name}: {w:.2f}s "
                f"({1e3 * w / args.draws:.2f} ms/step) "
                f"move_se_acc={accs[name]:.3f}",
                flush=True,
            )
    ms = {
        k: 1e3 * float(np.mean(v)) / args.draws for k, v in walls.items()
    }
    print(json.dumps({
        "chains": C, "draws": args.draws,
        "ms_per_step_xla": round(ms["xla"], 2),
        "ms_per_step_fused": round(ms["fused"], 2),
        "speedup": round(ms["xla"] / ms["fused"], 3),
        "acc_xla": round(accs["xla"], 4),
        "acc_fused": round(accs["fused"], 4),
    }))


if __name__ == "__main__":
    main()
