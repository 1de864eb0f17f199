"""Burst-granular checkpoint/resume.

The reference has no resume (SURVEY.md §5): its burst loop threads kernel
state between h5 writes but restart logic was never implemented.  Here the
full sampler state — chain state, PRNG key, step size, mass matrix, draw
offset — is serialized after every burst, so a preempted run (standard on
TPU pods) resumes losing at most one burst.
"""

import os

import numpy as np
import jax


def save(path, *, state, key, step_size, inv_mass_diag, offset, extra=None):
    """Atomically writes a checkpoint npz."""
    # np.savez appends ".npz" unless the name already ends with it
    tmp = path + ".tmp.npz"
    flat, treedef = jax.tree.flatten(state)
    payload = {
        "key": np.asarray(key),
        "step_size": np.asarray(step_size),
        "inv_mass_diag": np.asarray(inv_mass_diag),
        "offset": np.asarray(offset),
        "num_state_leaves": np.asarray(len(flat)),
    }
    for i, leaf in enumerate(flat):
        payload[f"state_{i}"] = np.asarray(leaf)
    for k, v in (extra or {}).items():
        payload["extra_" + k] = np.asarray(v)
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load(path, state_template):
    """Loads a checkpoint; returns (state, key, step_size, inv_mass, offset, extra)."""
    with np.load(path) as z:
        n = int(z["num_state_leaves"])
        leaves = [z[f"state_{i}"] for i in range(n)]
        _, treedef = jax.tree.flatten(state_template)
        state = jax.tree.unflatten(treedef, leaves)
        extra = {
            k[len("extra_") :]: z[k] for k in z.files if k.startswith("extra_")
        }
        return (
            state,
            z["key"],
            z["step_size"],
            z["inv_mass_diag"],
            int(z["offset"]),
            extra,
        )


def exists(path):
    return os.path.exists(path)
