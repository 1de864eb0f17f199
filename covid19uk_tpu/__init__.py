"""covid19uk_tpu — TPU-native Bayesian spatial SEIR meta-population framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``chrism0dwk/covid19uk`` package (TF2/TFP + gemlib).  The public API mirrors the
reference's five pipeline verbs (reference: ``covid19uk/__init__.py:3-21``):

    assemble_data        config.yaml  -> inferencedata HDF5 (netCDF-style groups)
    mcmc                 inferencedata -> posterior HDF5
    thin_posterior       posterior HDF5 -> samples pickle
    predict              samples + data -> predictions
    reproduction_number  samples + data -> R_t / R_it
    within_between       samples + data -> within/between summary CSV

Architectural departures from the reference (TPU-first):

* The chain-binomial log-likelihood is evaluated **fully in parallel over
  time** (state via parallel prefix-sum, infection pressure via one
  ``[M,M] @ [M,T]`` MXU matmul) instead of the reference's sequential
  TF scan.  Only forward simulation is a ``lax.scan``.
* Everything is a pure function over pytrees; multi-chain by construction via
  ``vmap`` / ``shard_map`` over a ``jax.sharding.Mesh`` chain axis.
* dtype is configurable; float32 with numerically-stable Stirling-corrected
  binomial log-pmfs on TPU, float64 available on CPU for parity testing.
"""

from covid19uk_tpu.models.seir import (
    STOICHIOMETRY,
    TIME_DELTA,
    NU,
    compute_state,
    chain_binomial_log_prob,
    chain_binomial_sample,
)
from covid19uk_tpu.models.spec import (
    CovidUK,
    ModelData,
    pack_parameters,
    unpack_parameters,
    constrain_parameters,
    unconstrain_parameters,
)
from covid19uk_tpu.models.ngm import next_generation_matrix_fn

__version__ = "0.1.0"

__all__ = [
    "STOICHIOMETRY",
    "TIME_DELTA",
    "NU",
    "compute_state",
    "chain_binomial_log_prob",
    "chain_binomial_sample",
    "CovidUK",
    "ModelData",
    "pack_parameters",
    "unpack_parameters",
    "constrain_parameters",
    "unconstrain_parameters",
    "next_generation_matrix_fn",
    "assemble_data",
    "mcmc",
    "thin_posterior",
    "predict",
    "reproduction_number",
    "within_between",
    "__version__",
]


def __getattr__(name):
    # Lazy imports for the pipeline verbs: they pull in host-side IO deps
    # (pandas, h5py) that the pure compute path does not need.
    if name == "assemble_data":
        from covid19uk_tpu.data.assemble import assemble_data

        return assemble_data
    if name == "mcmc":
        from covid19uk_tpu.inference.driver import mcmc

        return mcmc
    if name == "thin_posterior":
        from covid19uk_tpu.posterior.thin import thin_posterior

        return thin_posterior
    if name == "predict":
        from covid19uk_tpu.posterior.predict import predict

        return predict
    if name == "reproduction_number":
        from covid19uk_tpu.posterior.reproduction_number import (
            reproduction_number,
        )

        return reproduction_number
    if name == "within_between":
        from covid19uk_tpu.posterior.within_between import within_between

        return within_between
    raise AttributeError(f"module 'covid19uk_tpu' has no attribute {name!r}")
