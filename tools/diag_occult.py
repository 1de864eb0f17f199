"""Why is occult acceptance ~0 at UK scale? (round-4 diagnostic)

The occult kernels (event_kernels.occult_step — reference contract
``UncalibratedOccultUpdate``, mcmc_kernel_factory.py:89-113) propose a
location ~ Uniform(M) and a time ~ Uniform(last 21 days).  At NI scale
(M=11) the production run accepts at 0.29-0.38; at UK scale (M=380) the
mixing bench measures ~0.000.  Since occults are the only kernel that
changes latent TOTALS, zero acceptance freezes the infectious person-time
mode — the binding equilibrium mixing resource (see README "mixing
study").

This tool quantifies the proposal-quality collapse on the same synthetic
equilibrium draw the mixing bench starts from: it samples NPROP exact
occult proposals (same code path as the kernel: trunc-geometric size,
add/delete coin, uniform (loc, t)) and reports

  * acceptance probability  E[min(1, e^{log_alpha})],
  * the null fraction (delete drawn on an empty cell),
  * log_alpha quantiles split by add/delete,
  * how concentrated the window's event mass is across locations
    (the fraction of locations holding 90% of the window's events),

for S->E (k=0) and E->I (k=1) at NI and UK scale.  The concentration
number is the design input for a *guided* occult proposal (location
sampled ∝ current activity with exact Hastings correction).

Usage: python tools/diag_occult.py [--nprop 8192]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def diagnose(scale, nprop, nmax=15, x_decay=0.9, seed=0, data_file=None):
    import jax
    import jax.numpy as jnp

    from covid19uk_tpu.inference.event_kernels import (
        _log_mass_geometric,
        _sample_truncated_geometric,
    )
    from covid19uk_tpu.inference.gibbs import case_guide_logits
    from covid19uk_tpu.inference.likelihood import (
        WindowedEvaluator,
        make_context,
    )
    from covid19uk_tpu.models import seir
    from covid19uk_tpu.models.spec import (
        constrain_parameters,
        unpack_parameters,
    )
    from covid19uk_tpu.utils.synthetic import (
        build_synthetic_model,
        initial_chain_state,
    )

    if data_file is not None:
        # Real covariates + production imputation init (bench.py
        # build_real's stack) — the venue where occult acceptance actually
        # matters: the synthetic UK has ZERO events in the occult window
        # (memory/synthetic-uk-burnout.md).
        from covid19uk_tpu.inference.driver import initialize_from_cases
        from covid19uk_tpu.inference.gibbs import ChainState
        from covid19uk_tpu.models.spec import CovidUK, ModelData
        from covid19uk_tpu.utils import ncio

        constant = ncio.load_group(data_file, "constant_data")
        observations = ncio.load_group(data_file, "observations")
        cases = np.asarray(observations["cases"], np.float64)
        data = ModelData.create(
            constant.variables, jnp.float32, num_chains=1, keep_C=False
        )
        init_state, events_np = initialize_from_cases(cases, data.N, seed=0)
        M, T = events_np.shape[:2]
        model = CovidUK(data, jnp.asarray(init_state, jnp.float32), 0, T)
        st0 = ChainState(
            u=jnp.zeros((6 + (T - 1) + M,), jnp.float32),
            events=jnp.asarray(events_np, jnp.float32),
        )
    else:
        M, T = (11, 32) if scale == "ni" else (380, 120)
        model = build_synthetic_model(M, T, jnp.float32)
        st0 = initial_chain_state(model)
    events = st0.events
    state = seir.compute_state(model.initial_state, events)
    params = unpack_parameters(constrain_parameters(st0.u), T, M)
    ctx = make_context(model, params)
    t_lo, t_hi = T - 21, T
    ev = WindowedEvaluator(ctx=ctx, window=T - t_lo)

    # Guided location weights: the production formula itself
    # (gibbs.case_guide_logits — shared, not duplicated).
    guide_logits = case_guide_logits(events, (t_lo, t_hi), 0.1)

    def one(key, target_id, guided):
        k_loc, k_t, k_dir, k_x = jax.random.split(key, 4)
        if guided:
            loc = jax.random.categorical(k_loc, guide_logits)
        else:
            loc = jax.random.randint(k_loc, (), 0, M)
        t = jax.random.randint(k_t, (), t_lo, t_hi)
        is_add = jax.random.bernoulli(k_dir, 0.5)
        count = events[loc, t, target_id]
        cap_del = jnp.minimum(jnp.asarray(float(nmax)), count)
        x_add, _ = _sample_truncated_geometric(
            k_x, jnp.asarray(float(nmax)), x_decay
        )
        x_del, _ = _sample_truncated_geometric(k_x, cap_del, x_decay)
        can_delete = count > 0
        x = jnp.where(is_add, x_add, jnp.where(can_delete, x_del, 0.0))
        delta_x = jnp.where(is_add, x, -x)
        delta_lp = ev.occult_delta(
            events, state, loc, t, delta_x, target_id
        )
        nmax_f = jnp.asarray(float(nmax))
        log_h_add = _log_mass_geometric(nmax_f, x_decay) - \
            _log_mass_geometric(jnp.minimum(nmax_f, count + x_add), x_decay)
        log_h_del = _log_mass_geometric(cap_del, x_decay) - \
            _log_mass_geometric(nmax_f, x_decay)
        hastings = jnp.where(is_add, log_h_add, log_h_del)
        log_alpha = delta_lp + hastings
        is_null = ~is_add & ~can_delete
        return log_alpha, is_add, is_null

    keys = jax.random.split(jax.random.PRNGKey(seed), nprop)
    out = {}
    for k_id, name, guided in (
        (0, "S->E", False),
        (1, "E->I", False),
        (0, "S->E guided", True),
        (1, "E->I guided", True),
    ):
        la, is_add, is_null = jax.jit(
            jax.vmap(lambda k: one(k, k_id, guided))
        )(keys)
        la = np.asarray(la, np.float64)
        is_add = np.asarray(is_add)
        is_null = np.asarray(is_null)
        p_acc = np.where(is_null, 0.0, np.minimum(1.0, np.exp(la)))
        win = np.asarray(events[:, t_lo:t_hi, k_id])
        per_loc = win.sum(axis=1)
        order = np.sort(per_loc)[::-1]
        cum = np.cumsum(order) / max(order.sum(), 1.0)
        n90 = int(np.searchsorted(cum, 0.9) + 1) if order.sum() else 0
        q = lambda a, p: float(np.quantile(a, p)) if a.size else float("nan")
        out[name] = {
            "acc_prob": float(p_acc.mean()),
            "null_frac": float(is_null.mean()),
            "add_log_alpha_q50": q(la[is_add], 0.5),
            "add_log_alpha_q90": q(la[is_add], 0.9),
            "del_log_alpha_q50": q(la[~is_add & ~is_null], 0.5),
            "del_log_alpha_q90": q(la[~is_add & ~is_null], 0.9),
            "window_events_total": float(win.sum()),
            "active_locs": int((per_loc > 0).sum()),
            "locs_holding_90pct": n90,
            "M": M,
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprop", type=int, default=8192)
    ap.add_argument("--nmax", type=int, default=15)
    ap.add_argument("--x-decay", type=float, default=0.9)
    ap.add_argument("--data", default=None,
                    help="inferencedata.h5 with real covariates (replaces "
                    "both synthetic scales)")
    args = ap.parse_args()
    import json

    if args.data is not None:
        res = diagnose("real", args.nprop, args.nmax, args.x_decay,
                       data_file=args.data)
        for name, d in res.items():
            print(json.dumps({"scale": "real", "target": name, **d}))
        return
    for scale in ("ni", "uk"):
        res = diagnose(scale, args.nprop, args.nmax, args.x_decay)
        for name, d in res.items():
            print(json.dumps({"scale": scale, "target": name, **d}))


if __name__ == "__main__":
    main()
