"""Unit tests: kernels vs closed forms (SURVEY.md §4 tier 1)."""

import numpy as np
import jax.numpy as jnp

from spatial_alignment_tpu.ops.kernels import (
    rbf_kernel,
    matern12_kernel,
    matern32_kernel,
    rbf_kernel_numpy,
    pairwise_sqdist,
)


def _naive_sqdist(x1, x2):
    return ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)


def test_pairwise_sqdist_matches_naive(rng):
    x1 = rng.standard_normal((7, 3)).astype(np.float32)
    x2 = rng.standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(got, _naive_sqdist(x1, x2), rtol=1e-5, atol=1e-5)


def test_pairwise_sqdist_batched(rng):
    x1 = rng.standard_normal((4, 7, 2)).astype(np.float32)
    x2 = rng.standard_normal((4, 5, 2)).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(x1), jnp.asarray(x2)))
    for b in range(4):
        np.testing.assert_allclose(got[b], _naive_sqdist(x1[b], x2[b]), rtol=1e-5, atol=1e-5)


def test_rbf_closed_form(rng):
    x1 = rng.uniform(0, 5, (6, 2))
    x2 = rng.uniform(0, 5, (4, 2))
    log_ls, log_var = 0.7, -0.3
    got = np.asarray(rbf_kernel(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), log_ls, log_var))
    want = np.exp(log_var) * np.exp(
        -0.5 * _naive_sqdist(x1, x2) / np.exp(log_ls) ** 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rbf_diag_path(rng):
    x = rng.uniform(0, 5, (6, 2)).astype(np.float32)
    got = np.asarray(rbf_kernel(jnp.asarray(x), jnp.asarray(x), 0.2, 0.1, diag=True))
    np.testing.assert_allclose(got, np.exp(0.1) * np.ones(6), rtol=1e-6)


def test_matern12_closed_form(rng):
    x1 = rng.uniform(0, 5, (6, 2))
    x2 = rng.uniform(0, 5, (4, 2))
    log_ls, log_var = 0.4, 0.9
    got = np.asarray(
        matern12_kernel(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), log_ls, log_var)
    )
    d = np.sqrt(_naive_sqdist(x1, x2) + 1e-10)
    # reference form has the non-standard 0.5 factor (util/util.py:47)
    want = np.exp(log_var) * np.exp(-0.5 * d / np.exp(log_ls))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_matern32_closed_form(rng):
    x1 = rng.uniform(0, 5, (6, 2))
    x2 = rng.uniform(0, 5, (4, 2))
    log_ls, log_var = -0.2, 0.3
    got = np.asarray(
        matern32_kernel(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), log_ls, log_var)
    )
    d = np.sqrt(_naive_sqdist(x1, x2) + 1e-10)
    inner = np.sqrt(3.0) * d / np.exp(log_ls)
    want = np.exp(log_var) * (1 + inner) * np.exp(-inner)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_rbf_numpy_twin_agrees(rng):
    x = rng.uniform(0, 5, (6, 2))
    got = rbf_kernel_numpy(x, x, np.array([0.3, 0.5]))
    want = np.asarray(
        rbf_kernel(jnp.asarray(x, jnp.float32), jnp.asarray(x, jnp.float32), 0.5, 0.3)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kernel_symmetry_and_psd(rng):
    x = rng.uniform(0, 10, (20, 2)).astype(np.float32)
    for kern in (rbf_kernel, matern12_kernel, matern32_kernel):
        K = np.asarray(kern(jnp.asarray(x), jnp.asarray(x), 0.5, 0.0))
        np.testing.assert_allclose(K, K.T, atol=1e-5)
        w = np.linalg.eigvalsh(K.astype(np.float64) + 1e-5 * np.eye(20))
        assert w.min() > 0
