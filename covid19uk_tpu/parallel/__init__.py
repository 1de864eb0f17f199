"""Parallelism layer: device meshes, sharded multi-chain MCMC, diagnostics.

The reference is single-process/single-device (SURVEY.md §2.8); this layer is
the TPU-native capability it lacks: chain parallelism over a
``jax.sharding.Mesh`` (the DP analogue), optional location-axis sharding of
the event tensor (the SP/TP analogue for MSOA-scale geographies), pooled
adaptation statistics, and cross-chain convergence diagnostics.
"""

from covid19uk_tpu.parallel.mesh import chain_mesh, chain_space_mesh
from covid19uk_tpu.parallel.diagnostics import potential_scale_reduction, effective_sample_size

__all__ = [
    "chain_mesh",
    "chain_space_mesh",
    "potential_scale_reduction",
    "effective_sample_size",
]
