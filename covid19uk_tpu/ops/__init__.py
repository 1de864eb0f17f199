"""Numerical primitives: stable binomial pmfs, Pallas kernels."""

from covid19uk_tpu.ops.binomial import (
    lgamma_diff,
    log_choose,
    binomial_log_pmf,
    binomial_log_pmf_from_rate,
)

__all__ = [
    "lgamma_diff",
    "log_choose",
    "binomial_log_pmf",
    "binomial_log_pmf_from_rate",
]
