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


def test_distribute_pins_xla_per_model_only(rng):
    """distribute() with a model-axis-sharded variational state pins THAT
    model's spec.cholesky_impl to 'xla' (pallas_call has no SPMD partitioning
    rule) without touching process-global state: a single-device model built
    afterwards in the same process keeps the 'auto' (Pallas-on-TPU) default,
    and explicit choices — per-model or via the deprecated global override —
    are left alone."""
    import jax
    from spatial_alignment_tpu.parallel import make_mesh, distribute
    import spatial_alignment_tpu as sat

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    X = rng.uniform(0, 10, (40, 2)).astype(np.float32)
    Y = rng.standard_normal((40, 4)).astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": [20, 20]}}
    assert linalg.get_cholesky_impl() == "auto"
    model = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                n_latent_gps={"expression": 4})
    mesh = make_mesh(8, model_parallel=2)
    distribute(model, mesh)
    assert model.spec.cholesky_impl == "xla"
    # The process-global default is untouched...
    assert linalg.get_cholesky_impl() == "auto"
    # ...so a fresh single-device model keeps the auto (Pallas-on-TPU) default.
    fresh = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                n_latent_gps={"expression": 4})
    assert fresh.spec.cholesky_impl == "auto"
    # An explicit per-model choice survives distribute().
    forced = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                 n_latent_gps={"expression": 4},
                                 cholesky_impl="pallas")
    distribute(forced, mesh)
    assert forced.spec.cholesky_impl == "pallas"
    # The deprecated global override also suppresses the pin.
    try:
        linalg.set_cholesky_impl("pallas")
        model2 = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                     n_latent_gps={"expression": 4})
        distribute(model2, mesh)
        assert model2.spec.cholesky_impl == "auto"
        assert linalg.get_cholesky_impl() == "pallas"
    finally:
        linalg.set_cholesky_impl("auto")


def test_spec_impl_overrides_global(rng, interp):
    """A per-model spec impl ('xla'/'pallas') wins over the module global;
    spec-'auto' defers to the global."""
    A_big = jnp.asarray(_spd(rng, 2, 128))
    try:
        linalg.set_cholesky_impl("pallas")
        # Explicit per-call 'xla' must ignore the global 'pallas'.
        L = np.asarray(linalg._chol(A_big, "xla"))
        np.testing.assert_allclose(
            L @ np.swapaxes(L, -1, -2), np.asarray(A_big), rtol=2e-4, atol=2e-3
        )
        # Per-call 'auto'/None defer to the global (pallas here; interpret
        # mode makes it runnable on CPU).
        L2 = np.asarray(linalg._chol(A_big, "auto"))
        np.testing.assert_allclose(
            L2 @ np.swapaxes(L2, -1, -2), np.asarray(A_big), rtol=2e-4, atol=2e-3
        )
    finally:
        linalg.set_cholesky_impl("auto")
