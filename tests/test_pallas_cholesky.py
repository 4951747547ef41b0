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


@pytest.mark.parametrize("B,m", [(3, 200), (2, 128), (1, 300), (14, 50)])
def test_matches_xla_forward(rng, interp, B, m):
    A = jnp.asarray(_spd(rng, B, m))
    L = np.asarray(pc.cholesky(A))
    Lref = np.asarray(jnp.linalg.cholesky(A))
    rel = np.abs(L - Lref).max() / np.abs(Lref).max()
    assert rel < 1e-4, rel
    # exact lower-triangularity (upper masked in-kernel)
    assert np.abs(np.triu(L, 1)).max() == 0.0


@pytest.mark.parametrize("B,m", [(2, 128), (14, 50)])
def test_gradient_matches_xla(rng, interp, B, m):
    A = jnp.asarray(_spd(rng, B, m))
    w = jnp.asarray(rng.standard_normal((B, m, m)).astype(np.float32))
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
    shapes to the kernel; everything else stays on XLA. The default is
    'auto': Pallas on the TPU backend (within the gates), XLA elsewhere —
    so on this CPU test backend auto must resolve to XLA."""
    assert linalg.get_cholesky_impl() == "auto"
    A_small = jnp.asarray(_spd(rng, 4, 16))
    A_big = jnp.asarray(_spd(rng, 2, 128))
    try:
        for impl in ("auto", "pallas"):
            linalg.set_cholesky_impl(impl)
            # Both paths must factor correctly regardless of which impl runs.
            for A in (A_small, A_big):
                L = np.asarray(linalg._chol(A))
                np.testing.assert_allclose(
                    L @ np.swapaxes(L, -1, -2), np.asarray(A), rtol=2e-4, atol=2e-3
                )
    finally:
        linalg.set_cholesky_impl("auto")
    with pytest.raises(ValueError):
        linalg.set_cholesky_impl("bogus")


def test_distribute_forces_xla_for_sharded_state(rng):
    """distribute() with a model-axis-sharded variational state must flip the
    'auto' Cholesky impl to XLA (pallas_call has no SPMD partitioning rule);
    an explicit user setting is left alone."""
    import jax
    from spatial_alignment_tpu.parallel import make_mesh, distribute
    import spatial_alignment_tpu as sat

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    X = rng.uniform(0, 10, (40, 2)).astype(np.float32)
    Y = rng.standard_normal((40, 4)).astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": [20, 20]}}
    try:
        linalg.set_cholesky_impl("auto")
        model = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                    n_latent_gps={"expression": 4})
        mesh = make_mesh(8, model_parallel=2)
        distribute(model, mesh)
        assert linalg.get_cholesky_impl() == "xla"
        # Explicit setting survives a second distribute().
        linalg.set_cholesky_impl("pallas")
        model2 = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                     n_latent_gps={"expression": 4})
        distribute(model2, mesh)
        assert linalg.get_cholesky_impl() == "pallas"
    finally:
        linalg.set_cholesky_impl("auto")
