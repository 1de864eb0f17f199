"""Cross-chain convergence diagnostics: split-R-hat and effective sample size.

The reference has no convergence diagnostics beyond printed acceptance rates
(SURVEY.md §5 'Metrics').  These run on-device over ``[chains, draws, ...]``
stacks and are the gating statistics for the multi-chain driver and the
ESS/sec benchmark.
"""

import jax.numpy as jnp
import numpy as np


def potential_scale_reduction(draws):
    """Split-chain R-hat (Gelman-Rubin, split form).

    Args:
      draws: ``[chains, draws, ...]``.

    Returns:
      R-hat per trailing parameter element.
    """
    C, N = draws.shape[0], draws.shape[1]
    half = N // 2
    split = jnp.concatenate(
        [draws[:, :half], draws[:, half : 2 * half]], axis=0
    )  # [2C, half, ...]
    m, n = split.shape[0], split.shape[1]
    chain_means = jnp.mean(split, axis=1)  # [2C, ...]
    grand_mean = jnp.mean(chain_means, axis=0)
    B = n * jnp.var(chain_means, axis=0, ddof=1)
    W = jnp.mean(jnp.var(split, axis=1, ddof=1), axis=0)
    var_plus = (n - 1) / n * W + B / n
    return jnp.sqrt(var_plus / W)


def _autocovariance(x):
    """Autocovariance along axis 1 via FFT; x: [chains, draws, ...]."""
    n = x.shape[1]
    x = x - jnp.mean(x, axis=1, keepdims=True)
    size = 2 * n  # zero-pad to avoid circular wrap
    f = jnp.fft.rfft(x, n=size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :n]
    return jnp.real(acov) / n


def effective_sample_size(draws):
    """Bulk ESS with Geyer initial-positive-sequence truncation (vectorized
    via a monotone mask rather than a data-dependent loop — jit-friendly).

    Args:
      draws: ``[chains, draws, ...]``.

    Returns:
      ESS per trailing parameter element.
    """
    C, N = draws.shape[0], draws.shape[1]
    acov = _autocovariance(draws)  # [C, N, ...]
    mean_acov = jnp.mean(acov, axis=0)  # [N, ...]
    chain_var = acov[:, 0] * N / (N - 1.0)
    W = jnp.mean(chain_var, axis=0)
    mean_est = jnp.mean(draws, axis=1)  # [C, ...]
    B_over_n = jnp.var(mean_est, axis=0, ddof=1) if C > 1 else 0.0
    var_plus = W * (N - 1.0) / N + B_over_n

    # rho_t = 1 - (W - mean_acov_t) / var_plus
    rho = 1.0 - (W - mean_acov) / var_plus  # [N, ...]
    # Geyer: sum paired rho_{2k}+rho_{2k+1} while positive.
    n_pairs = (N - 1) // 2
    pair = rho[1 : 1 + 2 * n_pairs]
    pair = pair.reshape((n_pairs, 2) + rho.shape[1:]).sum(axis=1)
    positive = pair > 0.0
    # keep only the initial run of positive pairs
    keep = jnp.cumprod(positive.astype(rho.dtype), axis=0)
    tau = 1.0 + 2.0 * jnp.sum(pair * keep, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(N, rho.dtype)))
    return C * N / tau


def gate_statistics(draws):
    """Host-side (pure numpy) split R-hat + bulk ESS for the between-burst
    convergence gate.  Numerically mirrors the jnp functions above (tested
    against them) — numpy because per-burst eager dispatch over a remote
    TPU tunnel is pathologically slow and the gate arrays are tiny.

    Args:
      draws: ``[chains, draws, params]`` numpy array.

    Returns:
      ``(max_rhat, min_ess)`` floats over the parameter axis.
    """
    draws = np.asarray(draws, np.float64)
    C, N = draws.shape[0], draws.shape[1]

    # ---- split R-hat ----
    half = N // 2
    split = np.concatenate(
        [draws[:, :half], draws[:, half : 2 * half]], axis=0
    )
    m, n = split.shape[0], split.shape[1]
    chain_means = split.mean(axis=1)
    B = n * chain_means.var(axis=0, ddof=1)
    W = split.var(axis=1, ddof=1).mean(axis=0)
    rhat = np.sqrt(((n - 1) / n * W + B / n) / W)

    # ---- bulk ESS (Geyer initial positive sequence) ----
    x = draws - draws.mean(axis=1, keepdims=True)
    size = 2 * N
    f = np.fft.rfft(x, n=size, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=size, axis=1)[:, :N].real / N
    mean_acov = acov.mean(axis=0)
    Wv = (acov[:, 0] * N / (N - 1.0)).mean(axis=0)
    B_over_n = draws.mean(axis=1).var(axis=0, ddof=1) if C > 1 else 0.0
    var_plus = Wv * (N - 1.0) / N + B_over_n
    rho = 1.0 - (Wv - mean_acov) / var_plus
    n_pairs = (N - 1) // 2
    pair = rho[1 : 1 + 2 * n_pairs]
    pair = pair.reshape((n_pairs, 2) + rho.shape[1:]).sum(axis=1)
    keep = np.cumprod(pair > 0.0, axis=0)
    tau = np.maximum(
        1.0 + 2.0 * (pair * keep).sum(axis=0), 1.0 / np.log10(N)
    )
    ess = C * N / tau
    return float(np.max(rhat)), float(np.min(ess))
