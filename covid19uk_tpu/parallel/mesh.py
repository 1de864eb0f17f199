"""Device-mesh construction helpers."""

import numpy as np
import jax
from jax.sharding import Mesh


def chain_mesh(n_devices=None, devices=None):
    """1-D mesh over a ``chain`` axis (pure data parallelism)."""
    devices = devices or jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.asarray(devices), axis_names=("chain",))


def chain_space_mesh(n_devices=None, devices=None, space=None):
    """2-D mesh (chain, space): chains data-parallel, the location axis of
    the event tensor / commuting matmul model-parallel (the SP analogue for
    MSOA-scale geographies, SURVEY.md §2.8)."""
    devices = devices or jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    if space is None:
        space = 2 if n % 2 == 0 and n >= 4 else 1
    chain = n // space
    arr = np.asarray(devices).reshape(chain, space)
    return Mesh(arr, axis_names=("chain", "space"))
