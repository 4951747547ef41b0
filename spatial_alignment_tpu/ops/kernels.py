"""Stationary covariance functions (TPU-native, pure jnp).

Parity targets (reference: /root/reference/gpsa/util/util.py:8-66):
  - log-space (unconstrained) lengthscale / output-variance parameterization,
  - ``diag=True`` fast path returning only k(x_i, x_i'),
  - matern kernels use the reference's ``exp(-0.5 d / l)`` (matern12) and
    ``(1 + sqrt(3) d / l) exp(-sqrt(3) d / l)`` (matern32) forms, including the
    reference's non-standard 0.5 factor in matern12.

TPU notes: cross-Gram matrices are built from the expansion
``|x - z|^2 = |x|^2 + |z|^2 - 2 x.z`` so the O(N*M*D) work lands on the MXU as
one matmul instead of a broadcasted subtract (which would be VPU-bound and
materialize an (N, M, D) intermediate in HBM).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "rbf_kernel",
    "matern12_kernel",
    "matern32_kernel",
    "rbf_kernel_numpy",
    "get_kernel",
    "pairwise_sqdist",
]


def pairwise_sqdist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances between rows of x1 (..., N, D) and x2 (..., M, D).

    Uses the matmul expansion (MXU-friendly) and clamps tiny negatives from
    float cancellation to zero.
    """
    n1 = jnp.sum(jnp.square(x1), axis=-1)  # (..., N)
    n2 = jnp.sum(jnp.square(x2), axis=-1)  # (..., M)
    cross = jnp.einsum("...nd,...md->...nm", x1, x2)
    sq = n1[..., :, None] + n2[..., None, :] - 2.0 * cross
    return jnp.maximum(sq, 0.0)


def rbf_kernel(
    x1,
    x2,
    lengthscale_unconstrained,
    output_variance_unconstrained,
    diag: bool = False,
):
    """RBF kernel, parity with reference ``rbf_kernel`` (util/util.py:8-23).

    k(x, z) = exp(v) * exp(-0.5 * |x - z|^2 / exp(l)^2)
    """
    lengthscale = jnp.exp(lengthscale_unconstrained)
    output_variance = jnp.exp(output_variance_unconstrained)
    if diag:
        sq = jnp.sum(jnp.square(x1 - x2), axis=-1)
    else:
        sq = pairwise_sqdist(x1, x2)
    return output_variance * jnp.exp(-0.5 * sq / jnp.square(lengthscale))


_DIST_EPS = 1e-10  # matches reference eps under the sqrt (util/util.py:44,61)


def matern12_kernel(
    x1,
    x2,
    lengthscale_unconstrained,
    output_variance_unconstrained,
    diag: bool = False,
):
    """Matern-1/2, parity with reference (util/util.py:33-47): exp(-0.5 d / l)."""
    lengthscale = jnp.exp(lengthscale_unconstrained)
    output_variance = jnp.exp(output_variance_unconstrained)
    if diag:
        sq = jnp.sum(jnp.square(x1 - x2), axis=-1)
    else:
        sq = pairwise_sqdist(x1, x2)
    dists = jnp.sqrt(sq + _DIST_EPS)
    return output_variance * jnp.exp(-0.5 * dists / lengthscale)


def matern32_kernel(
    x1,
    x2,
    lengthscale_unconstrained,
    output_variance_unconstrained,
    diag: bool = False,
):
    """Matern-3/2, parity with reference (util/util.py:50-66)."""
    lengthscale = jnp.exp(lengthscale_unconstrained)
    output_variance = jnp.exp(output_variance_unconstrained)
    if diag:
        sq = jnp.sum(jnp.square(x1 - x2), axis=-1)
    else:
        sq = pairwise_sqdist(x1, x2)
    dists = jnp.sqrt(sq + _DIST_EPS)
    inner = np.sqrt(3.0) * dists / lengthscale
    return output_variance * (1.0 + inner) * jnp.exp(-inner)


def rbf_kernel_numpy(x, xp, kernel_params):
    """Numpy twin used by data generators (parity: util/util.py:26-30).

    kernel_params = [log output_scale, log lengthscale...].
    """
    output_scale = np.exp(kernel_params[0])
    lengthscales = np.exp(kernel_params[1:])
    diffs = np.expand_dims(x / lengthscales, 1) - np.expand_dims(xp / lengthscales, 0)
    return output_scale * np.exp(-0.5 * np.sum(diffs**2, axis=2))


_KERNELS = {
    "rbf": rbf_kernel,
    "matern12": matern12_kernel,
    "matern32": matern32_kernel,
}


def get_kernel(kernel):
    """Resolve a kernel by name or pass a callable through."""
    if callable(kernel):
        return kernel
    try:
        return _KERNELS[kernel]
    except KeyError:
        raise ValueError(
            f"Unknown kernel {kernel!r}; expected one of {sorted(_KERNELS)} or a callable"
        ) from None


def kernel_name(kernel) -> str:
    """Inverse of get_kernel for spec hashing; callables map to their __name__.

    Validates eagerly so a typo'd kernel name fails at construction, not at
    the first traced forward pass.
    """
    if isinstance(kernel, str):
        get_kernel(kernel)  # raises ValueError on unknown names
        return kernel
    for name, fn in _KERNELS.items():
        if fn is kernel:
            return name
    raise ValueError(
        f"Unknown kernel callable {kernel!r}; use one of {sorted(_KERNELS)} "
        "(custom kernel callables can be registered in ops.kernels._KERNELS)"
    )
