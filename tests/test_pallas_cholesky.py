"""Fused Pallas batched Cholesky vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spatial_alignment_tpu.ops import pallas_cholesky as pc
from spatial_alignment_tpu.ops import linalg


@pytest.fixture
def interp():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _spd(rng, B, m):
    a = rng.standard_normal((B, m, m)).astype(np.float32)
    return a @ np.swapaxes(a, -1, -2) + m * np.eye(m, dtype=np.float32)


@pytest.mark.parametrize("B,m", [(3, 200), (2, 128), (1, 300)])
def test_matches_xla_forward(rng, interp, B, m):
    A = jnp.asarray(_spd(rng, B, m))
    L = np.asarray(pc.cholesky(A))
    Lref = np.asarray(jnp.linalg.cholesky(A))
    rel = np.abs(L - Lref).max() / np.abs(Lref).max()
    assert rel < 1e-4, rel
    # exact lower-triangularity (upper masked in-kernel)
    assert np.abs(np.triu(L, 1)).max() == 0.0


def test_gradient_matches_xla(rng, interp):
    A = jnp.asarray(_spd(rng, 2, 128))
    w = jnp.asarray(rng.standard_normal((2, 128, 128)).astype(np.float32))
    g_p = jax.grad(lambda a: jnp.sum(pc.cholesky(a) * w))(A)
    g_x = jax.grad(lambda a: jnp.sum(jnp.linalg.cholesky(a) * w))(A)
    rel = float(jnp.abs(g_p - g_x).max() / jnp.abs(g_x).max())
    assert rel < 1e-4, rel


def test_nan_propagates_for_indefinite(rng, interp):
    """The jittered_cholesky NaN probes rely on indefinite inputs producing
    NaN, exactly like jnp.linalg.cholesky."""
    A = _spd(rng, 2, 128)
    A[0] -= (128 + 50.0) * np.eye(128, dtype=np.float32)
    L = np.asarray(pc.cholesky(jnp.asarray(A)))
    assert np.isnan(L[0]).any()
    assert not np.isnan(L[1]).any()


def test_linalg_dispatch_gate(rng, interp):
    """set_cholesky_impl('pallas') routes only m >= MIN_M, batch >= MIN_BATCH
    shapes to the kernel; everything else stays on XLA (and the default is
    XLA everywhere)."""
    A_small = jnp.asarray(_spd(rng, 4, 16))
    A_big = jnp.asarray(_spd(rng, 2, 128))
    try:
        linalg.set_cholesky_impl("pallas")
        # Both paths must factor correctly regardless of which impl runs.
        for A in (A_small, A_big):
            L = np.asarray(linalg._chol(A))
            np.testing.assert_allclose(
                L @ np.swapaxes(L, -1, -2), np.asarray(A), rtol=2e-4, atol=2e-3
            )
    finally:
        linalg.set_cholesky_impl("xla")
    with pytest.raises(ValueError):
        linalg.set_cholesky_impl("bogus")
