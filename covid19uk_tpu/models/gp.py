"""Gaussian-process regression conditional.

Covers the reference's ``conditional_gp`` helper
(``/root/reference/covid19uk/model_spec.py:129-136``), which rebinds a
``tfd.GaussianProcess``'s parameters into a
``tfd.GaussianProcessRegressionModel``.  Rather than wrapping a
distribution object, the conditional is derived directly: for a prior
``f ~ GP(m, k)`` observed with iid Gaussian noise at index points ``X``,
the posterior at new points ``X*`` is the standard regression conditional

    mean* = m(X*) + K(X*,X) (K(X,X) + s2 I)^-1 (y - m(X))
    cov*  = K(X*,X*) - K(X*,X) (K(X,X) + s2 I)^-1 K(X,X*)  [+ s2* I]

computed with one Cholesky factorization and triangular solves — dense
MXU-friendly matmuls, no explicit inverse, jittable and vmappable.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "GaussianProcess",
    "GaussianProcessPosterior",
    "conditional_gp",
    "rbf_kernel",
    "matern32_kernel",
]

_JITTER = 1e-9


def rbf_kernel(amplitude=1.0, length_scale=1.0) -> Callable:
    """Exponentiated-quadratic kernel: ``a^2 exp(-||x-y||^2 / (2 l^2))``."""

    def k(xa, xb):
        sq = jnp.sum((xa[:, None, :] - xb[None, :, :]) ** 2, axis=-1)
        return amplitude**2 * jnp.exp(-0.5 * sq / length_scale**2)

    return k


def matern32_kernel(amplitude=1.0, length_scale=1.0) -> Callable:
    """Matern-3/2 kernel: ``a^2 (1 + sqrt(3) d / l) exp(-sqrt(3) d / l)``."""

    def k(xa, xb):
        sq = jnp.sum((xa[:, None, :] - xb[None, :, :]) ** 2, axis=-1)
        d = jnp.sqrt(jnp.maximum(sq, 1e-36))
        z = jnp.sqrt(3.0) * d / length_scale
        return amplitude**2 * (1.0 + z) * jnp.exp(-z)

    return k


class GaussianProcess(NamedTuple):
    """A GP prior restricted to ``index_points`` (the reference's
    ``tfd.GaussianProcess(kernel, index_points, observation_noise_variance)``
    parameter bundle, model_spec.py:131-134)."""

    kernel: Callable  # (xa [N,D], xb [S,D]) -> [N,S] covariance block
    index_points: jnp.ndarray  # [N, D]
    observation_noise_variance: float = 0.0
    mean_fn: Optional[Callable] = None  # (x [N,D]) -> [N]; None = zero


class GaussianProcessPosterior(NamedTuple):
    """The conditioned GP marginal at the new index points: an MVN with
    dense covariance, plus sampling / log-density in Cholesky form."""

    mean: jnp.ndarray  # [S]
    covariance: jnp.ndarray  # [S, S]

    def stddev(self):
        # the schur complement's diagonal can dip epsilon-negative
        return jnp.sqrt(jnp.maximum(jnp.diagonal(self.covariance), 0.0))

    def _chol(self):
        s = self.covariance.shape[-1]
        return jnp.linalg.cholesky(
            self.covariance + _JITTER * jnp.eye(s, dtype=self.covariance.dtype)
        )

    def sample(self, key, sample_shape=()):
        z = jax.random.normal(
            key, tuple(sample_shape) + self.mean.shape, self.mean.dtype
        )
        return self.mean + z @ self._chol().T

    def log_prob(self, y):
        chol = self._chol()
        w = jax.scipy.linalg.solve_triangular(
            chol, y - self.mean, lower=True
        )
        half_logdet = jnp.sum(jnp.log(jnp.diagonal(chol)))
        s = self.mean.shape[-1]
        return (
            -0.5 * jnp.sum(w**2, axis=-1)
            - half_logdet
            - 0.5 * s * jnp.log(2.0 * jnp.pi)
        )


def conditional_gp(
    gp: GaussianProcess,
    observations,
    new_index_points,
    predictive_noise_variance=None,
) -> GaussianProcessPosterior:
    """Conditions ``gp`` on ``observations`` at its own index points and
    returns the posterior marginal at ``new_index_points``.

    Mirrors the reference helper (model_spec.py:129-136): the prior's
    ``index_points`` become the observation index points and the returned
    object is the regression posterior at the new points.  As in TFP's
    ``GaussianProcessRegressionModel``, ``predictive_noise_variance=None``
    defaults to the prior's ``observation_noise_variance`` (the returned
    marginal is over noisy *observations* at the new points; pass ``0.0``
    for the latent function).
    """
    def _as_points(pts):
        # A plain (N,) vector means N scalar points, i.e. [N, 1] — NOT the
        # atleast_2d reading of one N-dimensional point [1, N].
        pts = jnp.asarray(pts)
        return pts[:, None] if pts.ndim == 1 else pts

    x = _as_points(gp.index_points)
    xs = _as_points(new_index_points)
    y = jnp.asarray(observations)
    dtype = y.dtype
    noise = jnp.asarray(gp.observation_noise_variance, dtype)
    if predictive_noise_variance is None:
        predictive_noise_variance = noise
    pred_noise = jnp.asarray(predictive_noise_variance, dtype)

    mean_fn = gp.mean_fn or (lambda pts: jnp.zeros(pts.shape[:-1], dtype))
    kxx = gp.kernel(x, x) + (noise + _JITTER) * jnp.eye(
        x.shape[0], dtype=dtype
    )
    ksx = gp.kernel(xs, x)  # [S, N]
    kss = gp.kernel(xs, xs)

    chol = jnp.linalg.cholesky(kxx)
    # alpha = Kxx^-1 (y - m(X)); v = L^-1 Kxs
    alpha = jax.scipy.linalg.cho_solve((chol, True), y - mean_fn(x))
    v = jax.scipy.linalg.solve_triangular(chol, ksx.T, lower=True)  # [N, S]

    mean = mean_fn(xs) + ksx @ alpha
    cov = kss - v.T @ v + pred_noise * jnp.eye(xs.shape[0], dtype=dtype)
    return GaussianProcessPosterior(mean=mean, covariance=cov)
