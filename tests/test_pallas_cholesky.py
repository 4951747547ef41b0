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


def test_distribute_leaves_cholesky_impl_alone(rng):
    """distribute() no longer touches the Cholesky impl — per-model or
    global: the kernel carries its own SPMD partitioning rule
    (custom_partitioning, batch-dim sharding), so model-sharded Omega slabs
    keep the fused kernel and a single-device model built afterwards in the
    same process keeps the 'auto' (Pallas-on-TPU) default."""
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
    assert model.spec.cholesky_impl == "auto"
    assert linalg.get_cholesky_impl() == "auto"
    # A fresh single-device model keeps the auto (Pallas-on-TPU) default.
    fresh = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                n_latent_gps={"expression": 4})
    assert fresh.spec.cholesky_impl == "auto"
    # An explicit per-model choice survives distribute() too.
    forced = sat.VariationalGPSA(dd, m_X_per_view=8, m_G=8,
                                 n_latent_gps={"expression": 4},
                                 cholesky_impl="pallas")
    distribute(forced, mesh)
    assert forced.spec.cholesky_impl == "pallas"


def test_sharded_batch_cholesky_no_collectives(rng):
    """The batch-dim partitioning rule (make_partitioned_cholesky — the same
    rule the pallas kernel ships under on TPU, here with an XLA stand-in
    lower_fn since interpret-mode pallas can't lower through
    custom_partitioning): a batch-dim-sharded slab factors per shard —
    results match and the compiled program contains no collectives. Also
    covers 4-D slabs (the stacked jitter probes) sharded on an inner batch
    dim."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    f = pc.make_partitioned_cholesky(lambda a: jnp.linalg.cholesky(a))
    A = jnp.asarray(_spd(rng, 8, 16))
    ref = np.linalg.cholesky(np.asarray(A))
    for spec in (P("model", None, None), P(("data", "model"), None, None), P()):
        a = jax.device_put(A, NamedSharding(mesh, spec))
        compiled = jax.jit(f).lower(a).compile()
        out = compiled(a)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
        assert out.sharding.spec == spec or spec == P()
        hlo = compiled.as_text()
        for bad in ("all-gather", "all-reduce", "all-to-all",
                    "collective-permute"):
            assert bad not in hlo, f"unexpected collective {bad} for {spec}"
    # Stacked-probe shape: (2, B, m, m) sharded on dim 1.
    A4 = jnp.stack([A, A + jnp.eye(16)])
    a4 = jax.device_put(A4, NamedSharding(mesh, P(None, "model", None, None)))
    compiled = jax.jit(f).lower(a4).compile()
    out4 = compiled(a4)
    np.testing.assert_allclose(
        np.asarray(out4), np.linalg.cholesky(np.asarray(A4)), rtol=1e-4, atol=1e-4
    )
    assert "all-gather" not in compiled.as_text()


def test_vmapped_pallas_cholesky(rng, interp):
    """vmap over the kernel (vectorized multistart's trace shape) folds the
    mapped axis into the batch via the custom_vmap rule."""
    A = jnp.asarray(_spd(rng, 3, 128)).reshape(3, 1, 128, 128)
    out = jax.vmap(pc.cholesky)(A)
    np.testing.assert_allclose(
        np.asarray(out), np.linalg.cholesky(np.asarray(A)), rtol=1e-4, atol=1e-4
    )
    # grad composes with vmap through the custom VJP
    w = jnp.asarray(rng.standard_normal(A.shape).astype(np.float32))
    g = jax.vmap(jax.grad(lambda a, ww: jnp.sum(pc.cholesky(a) * ww)))(A, w)
    gx = jax.vmap(jax.grad(lambda a, ww: jnp.sum(jnp.linalg.cholesky(a) * ww)))(A, w)
    rel = float(jnp.abs(g - gx).max() / jnp.abs(gx).max())
    assert rel < 1e-4, rel


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
