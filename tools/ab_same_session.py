"""Same-session A/B of the UK-scale step wall between two source trees.

Times the `full` (TIMED-phase), `U1` and `pairs` (warmup-phase) variants
of the production step — exactly tools/profile_uk.py's stack — for TWO
versions of `covid19uk_tpu` inside ONE python process / ONE TPU tunnel
session, so the ~2x session-to-session wall variance cancels and the
ratio is trustworthy (CLAUDE.md measurement discipline).

Version A = the committed tree (`git archive <ref>`, default HEAD),
version B = the working tree.  Modules are purged and re-imported with
the other tree prepended to sys.path between arms; the jax client (and
the tunnel session) persists.

Usage: python tools/ab_same_session.py [--ref HEAD] [--chains 64]
       [--draws 200] [--variants full,U1,pairs]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_DIR = "/tmp/ab_old_tree"

M, T = 380, 120


def export_ref(ref):
    if os.path.isdir(OLD_DIR):
        shutil.rmtree(OLD_DIR)
    os.makedirs(OLD_DIR)
    subprocess.run(
        f"git -C {REPO} archive {ref} covid19uk_tpu | tar -x -C {OLD_DIR}",
        shell=True,
        check=True,
    )


def _purge():
    for name in list(sys.modules):
        if name == "covid19uk_tpu" or name.startswith("covid19uk_tpu."):
            del sys.modules[name]


def time_variants(tree_path, variants, chains, draws):
    """Imports covid19uk_tpu from tree_path and times the step variants."""
    _purge()
    sys.path.insert(0, tree_path)
    try:
        import jax
        import jax.numpy as jnp

        from covid19uk_tpu.inference.gibbs import (
            ChainState,
            EventKernelConfig,
            HMCTunables,
            make_mcmc_step,
        )
        from covid19uk_tpu.models.spec import (
            constrain_parameters,
            unpack_parameters,
        )
        from covid19uk_tpu.utils.synthetic import (
            build_synthetic_model,
            initial_chain_state,
        )

        dtype = jnp.float32
        model = build_synthetic_model(M, T, dtype)
        single = initial_chain_state(model)
        ev_keys = jax.random.split(jax.random.PRNGKey(100), chains)
        params_c = unpack_parameters(constrain_parameters(single.u), T, M)
        events = jax.jit(
            jax.vmap(lambda k: model.sample_seir(k, params_c))
        )(ev_keys)
        u = jnp.broadcast_to(single.u, (chains,) + single.u.shape)
        state = ChainState(u=u, events=events)
        P = u.shape[-1]
        tune = HMCTunables(
            step_size=jnp.full((chains,), 0.001, dtype),
            inv_mass_diag=jnp.ones((chains, P), dtype),
        )

        base = dict(
            dmax=84, mmax=2, nmax=25, occult_nmax=15,
            num_event_time_updates=5, t_range=(T - 21, T),
            num_pair_updates=0,
        )
        cfgs = {
            "full": (16, EventKernelConfig(**base)),
            "U1": (
                16,
                EventKernelConfig(**{**base, "num_event_time_updates": 1}),
            ),
            "pairs": (
                16,
                EventKernelConfig(**{**base, "num_pair_updates": 1}),
            ),
        }

        results = {}
        for name in variants:
            L, cfg = cfgs[name]
            step = make_mcmc_step(model, L, cfg)

            def run(key, st, tn, mdl):
                def body(s, k):
                    s, _ = step(k, s, tn, mdl)
                    return s, s.u[..., 0]

                keys = jax.random.split(key, draws)
                return jax.lax.scan(body, st, keys)

            run_j = jax.jit(jax.vmap(run, in_axes=(0, 0, 0, None)))
            keys = jax.random.split(jax.random.PRNGKey(0), chains)
            out = run_j(keys, state, tune, model)
            float(jnp.sum(out[1][..., -1]))  # compile + settle
            walls = []
            for s in range(3):
                t0 = time.time()
                out = run_j(
                    jax.random.split(jax.random.PRNGKey(1 + s), chains),
                    state, tune, model,
                )
                float(jnp.sum(out[1][..., -1]))
                walls.append(time.time() - t0)
            ms = min(walls) / draws * 1e3
            results[name] = round(ms, 3)
            print(f"    {name:6s} {ms:8.3f} ms/step", file=sys.stderr)
        return results
    finally:
        sys.path.remove(tree_path)
        _purge()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref", default="HEAD")
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--draws", type=int, default=200)
    p.add_argument("--variants", default="full,U1,pairs")
    args = p.parse_args()
    variants = args.variants.split(",")

    export_ref(args.ref)
    print(f"  arm A (committed {args.ref}):", file=sys.stderr)
    a = time_variants(OLD_DIR, variants, args.chains, args.draws)
    print("  arm B (working tree):", file=sys.stderr)
    b = time_variants(REPO, variants, args.chains, args.draws)
    # replay arm A's headline variant to bound within-session drift
    print("  arm A replay:", file=sys.stderr)
    a2 = time_variants(OLD_DIR, variants[:1], args.chains, args.draws)

    out = {
        "scale": {"M": M, "T": T, "chains": args.chains,
                  "draws": args.draws},
        "ref": args.ref,
        "A_committed_ms": a,
        "B_worktree_ms": b,
        "A_replay_ms": a2,
        "speedup_B_over_A": {
            k: round(a[k] / b[k], 3) for k in variants if b.get(k)
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
