"""Fused Pallas Cholesky+inverse vs the unfused XLA chain (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spatial_alignment_tpu.ops import pallas_factor as pf
from spatial_alignment_tpu.ops import linalg


@pytest.fixture
def interp():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _spd(rng, B, m):
    a = rng.standard_normal((B, m, m)).astype(np.float32)
    return a @ np.swapaxes(a, -1, -2) + m * np.eye(m, dtype=np.float32)


def _xla_chain(A):
    L = jnp.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return L, Linv


@pytest.mark.parametrize("B,m", [(3, 200), (2, 128), (14, 50), (1, 300)])
def test_matches_xla_forward(rng, interp, B, m):
    A = jnp.asarray(_spd(rng, B, m))
    L, Linv = pf.cholesky_and_inverse(A)
    Lr, Linvr = _xla_chain(A)
    rel_L = float(jnp.abs(L - Lr).max() / jnp.abs(Lr).max())
    rel_I = float(jnp.abs(Linv - Linvr).max() / jnp.abs(Linvr).max())
    assert rel_L < 1e-4, rel_L
    assert rel_I < 1e-4, rel_I
    # exact triangularity (masked writes in-kernel)
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0
    assert float(jnp.abs(jnp.triu(Linv, 1)).max()) == 0.0
    # the inverse actually inverts: L @ Linv = I to f32 tolerance
    resid = np.asarray(L @ Linv) - np.eye(m, dtype=np.float32)
    assert np.abs(resid).max() < 1e-3, np.abs(resid).max()


@pytest.mark.parametrize("B,m", [(2, 128), (6, 50)])
def test_gradient_matches_unfused_chain(rng, interp, B, m):
    A = jnp.asarray(_spd(rng, B, m))
    wL = jnp.asarray(rng.standard_normal((B, m, m)).astype(np.float32))
    wI = jnp.asarray(rng.standard_normal((B, m, m)).astype(np.float32))

    def fused(a):
        L, Linv = pf.cholesky_and_inverse(a)
        return jnp.sum(L * wL) + jnp.sum(Linv * wI)

    def unfused(a):
        L, Linv = _xla_chain(a)
        return jnp.sum(L * wL) + jnp.sum(Linv * wI)

    g_f = jax.grad(fused)(A)
    g_x = jax.grad(unfused)(A)
    rel = float(jnp.abs(g_f - g_x).max() / jnp.abs(g_x).max())
    assert rel < 2e-4, rel


def test_nan_propagates_to_both_outputs(rng, interp):
    """The jitter probes rely on indefinite inputs producing NaN in the
    factor; the fused inverse must carry it too."""
    A = _spd(rng, 2, 128)
    A[0] -= (128 + 50.0) * np.eye(128, dtype=np.float32)
    L, Linv = pf.cholesky_and_inverse(jnp.asarray(A))
    assert np.isnan(np.asarray(L[0])).any()
    assert np.isnan(np.asarray(Linv[0])).any()
    assert not np.isnan(np.asarray(L[1])).any()
    assert not np.isnan(np.asarray(Linv[1])).any()


def test_vmap_folds_into_batch(rng, interp):
    A = jnp.asarray(_spd(rng, 6, 64)).reshape(2, 3, 64, 64)
    L, Linv = jax.vmap(pf.cholesky_and_inverse)(A)
    Lr, Linvr = _xla_chain(A.reshape(6, 64, 64))
    np.testing.assert_allclose(
        np.asarray(L).reshape(6, 64, 64), np.asarray(Lr), rtol=0, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(Linv).reshape(6, 64, 64), np.asarray(Linvr), rtol=0, atol=2e-4
    )


def test_jittered_cholesky_inverse_unfused_parity(rng):
    """The unfused fallback of jittered_cholesky_inverse is bit-identical to
    jittered_cholesky + tri_inverse (the chain compute_factors ran before)."""
    A = jnp.asarray(_spd(rng, 3, 64))
    L1, I1 = linalg.jittered_cholesky_inverse(A, 1e-5, fused="off")
    L2 = linalg.jittered_cholesky(A, 1e-5)
    I2 = linalg.tri_inverse(L2)
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))


def test_joint_factor_inverse_unfused_parity(rng):
    """joint_factor_cholesky_inverse(n_inv=k, fused=off) returns the same
    factors as joint_factor_cholesky plus tri_inverse of the gram lanes."""
    gram = jnp.asarray(_spd(rng, 3, 64))
    sqt = jnp.asarray(rng.standard_normal((4, 64, 64)).astype(np.float32))
    Lg, Lp, inv = linalg.joint_factor_cholesky_inverse(
        gram, sqt, 1e-5, n_inv=3, fused="off"
    )
    Lg2, Lp2 = linalg.joint_factor_cholesky(gram, sqt, 1e-5)
    np.testing.assert_array_equal(np.asarray(Lg), np.asarray(Lg2))
    np.testing.assert_array_equal(np.asarray(Lp), np.asarray(Lp2))
    np.testing.assert_array_equal(
        np.asarray(inv), np.asarray(linalg.tri_inverse(Lg2))
    )


def test_gate_rejects_auto_and_off(rng):
    """'auto' currently resolves to OFF (pending the step A/B —
    pallas_factor_step_ab.json); only an explicit 'fused' dispatches."""
    assert not linalg._factor_fused_ok("auto", 200, 14, jnp.float32)
    assert not linalg._factor_fused_ok("off", 200, 14, jnp.float32)
    assert not linalg._factor_fused_ok(None, 200, 14, jnp.float32)
    assert linalg._factor_fused_ok("fused", 200, 14, jnp.float32)
    # shape gates
    assert not linalg._factor_fused_ok("fused", 32, 14, jnp.float32)
    assert not linalg._factor_fused_ok("fused", 200, 1, jnp.float32)
    with pytest.raises(ValueError, match="fused_factor_inverse"):
        linalg._factor_fused_ok("bogus", 200, 14, jnp.float32)


def test_fused_dispatch_appears_in_jaxpr(rng):
    """With fused='fused' the jittered factor+inverse traces one pallas
    kernel and no triangular_solve; with 'off' it traces the XLA chain."""
    A = jnp.asarray(_spd(rng, 3, 64))
    j_fused = str(
        jax.make_jaxpr(
            lambda a: linalg.jittered_cholesky_inverse(a, 1e-5, fused="fused")
        )(A)
    )
    assert "pallas_call" in j_fused
    j_off = str(
        jax.make_jaxpr(
            lambda a: linalg.jittered_cholesky_inverse(a, 1e-5, fused="off")
        )(A)
    )


def test_compute_factors_fused_matches_off(rng, interp):
    """End-to-end: a ModelSpec with fused_factor_inverse='fused' produces
    the same FactorPass (factors AND inverses) as 'off' at f32 tolerance,
    in both square (merged psd lanes) and triangular modes."""
    from spatial_alignment_tpu.models import core
    from conftest import make_two_view_data
    import spatial_alignment_tpu as sat
    from spatial_alignment_tpu.models.vgpsa import merge_hyperparams

    data = make_two_view_data(n_per_view=24, n_outputs=4)
    for tri in (False, True):
        m_off = sat.VariationalGPSA(
            data, m_X_per_view=64, m_G=64, n_latent_gps={"expression": None},
            seed=0, fused_factor_inverse="off", triangular_variational=tri,
            svgp_solve_mode="mixed",
        )
        m_fused = sat.VariationalGPSA(
            data, m_X_per_view=64, m_G=64, n_latent_gps={"expression": None},
            seed=0, fused_factor_inverse="fused", triangular_variational=tri,
            svgp_solve_mode="mixed",
        )
        hp_off = merge_hyperparams(m_off.params, m_off.consts)
        hp_fused = merge_hyperparams(m_fused.params, m_fused.consts)
        fp_off = core.compute_factors(m_off.spec, hp_off)
        fp_fused = core.compute_factors(m_fused.spec, hp_fused)
        for name in ("warp_Kuu_chol", "data_Kuu_chol", "warp_Kuu_inv", "data_Kuu_inv"):
            a, b = getattr(fp_off, name), getattr(fp_fused, name)
            assert (a is None) == (b is None), name
            if a is None:
                continue
            scale = max(float(jnp.abs(a).max()), 1.0)
            # Factors agree to f32 tolerance; the INVERSES of these
            # near-singular kernel Grams (cond ~1e6-1e7) legitimately
            # differ elementwise by ~cond*eps between any two f32
            # algorithms — the meaningful accuracy criterion there is the
            # inversion residual, asserted below.
            tol = 2e-2 if name.endswith("_inv") else 2e-4
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0,
                atol=tol * scale, err_msg=f"{name} tri={tri}",
            )
        for C, Li in (
            (fp_fused.warp_Kuu_chol, fp_fused.warp_Kuu_inv),
            (fp_fused.data_Kuu_chol[None], fp_fused.data_Kuu_inv[None]),
        ):
            resid = np.asarray(C @ Li) - np.eye(C.shape[-1], dtype=np.float32)
            assert np.abs(resid).max() < 1e-5, (tri, np.abs(resid).max())
