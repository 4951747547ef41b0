"""Fused Pallas batched triangular solve vs XLA (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from spatial_alignment_tpu.ops import pallas_trisolve as pt
from spatial_alignment_tpu.ops import linalg


@pytest.fixture
def interp():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _chol_factor(rng, B, m):
    a = rng.standard_normal((B, m, m)).astype(np.float32)
    return np.linalg.cholesky(
        a @ np.swapaxes(a, -1, -2) + m * np.eye(m, dtype=np.float32)
    ).astype(np.float32)


@pytest.mark.parametrize("B,m,n", [(14, 50, 51), (2, 128, 64), (1, 130, 5)])
def test_solve_matches_xla(rng, interp, B, m, n):
    L = jnp.asarray(_chol_factor(rng, B, m))
    rhs = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    for trans in (False, True):
        X = np.asarray(pt.tri_solve(L, rhs, trans))
        Xr = np.asarray(
            jsl.solve_triangular(L, rhs, lower=True, trans=1 if trans else 0)
        )
        rel = np.abs(X - Xr).max() / np.abs(Xr).max()
        assert rel < 1e-4, (trans, rel)


@pytest.mark.parametrize("B,m", [(14, 50), (2, 128)])
def test_inverse_matches_xla(rng, interp, B, m):
    L = jnp.asarray(_chol_factor(rng, B, m))
    Inv = np.asarray(pt.tri_inverse(L))
    eyeB = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), (B, m, m))
    Invr = np.asarray(jsl.solve_triangular(L, eyeB, lower=True))
    rel = np.abs(Inv - Invr).max() / np.abs(Invr).max()
    assert rel < 1e-4, rel
    # exact lower-triangularity (the padded identity block never leaks in)
    assert np.abs(np.triu(Inv, 1)).max() == 0.0


def test_gradients_match_xla(rng, interp):
    B, m, n = 2, 64, 16
    L = jnp.asarray(_chol_factor(rng, B, m))
    rhs = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    for trans in (False, True):
        gp = jax.grad(
            lambda l, r: jnp.sum(pt.tri_solve(l, r, trans) * w), argnums=(0, 1)
        )(L, rhs)
        gx = jax.grad(
            lambda l, r: jnp.sum(
                jsl.solve_triangular(l, r, lower=True, trans=1 if trans else 0)
                * w
            ),
            argnums=(0, 1),
        )(L, rhs)
        for a, b in zip(gp, gx):
            rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
            assert rel < 1e-4, (trans, rel)
    # tri_inverse pullback (the solve-based form, not the matmul-only one)
    gi = jax.grad(lambda l: jnp.sum(jnp.square(pt.tri_inverse(l))))(L)
    eyeB = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), (B, m, m))
    gir = jax.grad(
        lambda l: jnp.sum(jnp.square(jsl.solve_triangular(l, eyeB, lower=True)))
    )(L)
    rel = float(jnp.abs(gi - gir).max() / jnp.abs(gir).max())
    assert rel < 1e-4, rel


def test_nan_propagates(rng, interp):
    """jittered_cholesky's NaN probes may feed NaN factors through solves;
    the kernel must propagate them like XLA instead of masking them."""
    B, m, n = 2, 64, 8
    L = jnp.asarray(_chol_factor(rng, B, m))
    rhs = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    Lnan = L.at[0, 5, 5].set(jnp.nan)
    X = np.asarray(pt.tri_solve(Lnan, rhs, False))
    assert np.isnan(X[0]).any()
    assert not np.isnan(X[1]).any()


def test_vmap_folds_into_batch(rng, interp):
    """vmap (vectorized multistart's trace shape) folds the mapped axis into
    the kernel batch via custom_vmap; grad composes through it."""
    B, m, n = 2, 64, 16
    L = jnp.asarray(_chol_factor(rng, 3 * B, m)).reshape(3, B, m, m)
    rhs = jnp.asarray(
        rng.standard_normal((3, B, m, n)).astype(np.float32)
    )
    out = jax.vmap(lambda l, r: pt.tri_solve(l, r, False))(L, rhs)
    ref = jsl.solve_triangular(L, rhs, lower=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-4
    w = jnp.asarray(rng.standard_normal((3, B, m, n)).astype(np.float32))
    g = jax.vmap(
        jax.grad(lambda l, r, ww: jnp.sum(pt.tri_solve(l, r, False) * ww)),
        in_axes=(0, 0, 0),
    )(L, rhs, w)
    gx = jax.vmap(
        jax.grad(
            lambda l, r, ww: jnp.sum(
                jsl.solve_triangular(l, r, lower=True) * ww
            )
        ),
        in_axes=(0, 0, 0),
    )(L, rhs, w)
    assert float(jnp.abs(g - gx).max() / jnp.abs(gx).max()) < 1e-4


def test_linalg_dispatch_uses_kernel(rng, interp):
    """linalg.tri_solve / tri_inverse / cholesky_solve route gated f32 slabs
    to the kernel under impl='pallas' and stay correct either way."""
    B, m, n = 3, 64, 16
    L = jnp.asarray(_chol_factor(rng, B, m))
    rhs = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    ref_solve = np.asarray(jsl.solve_triangular(L, rhs, lower=True))
    ref_cho = np.asarray(jsl.cho_solve((L, True), rhs))
    eyeB = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), (B, m, m))
    ref_inv = np.asarray(jsl.solve_triangular(L, eyeB, lower=True))
    for impl in ("xla", "pallas"):
        np.testing.assert_allclose(
            np.asarray(linalg.tri_solve(L, rhs, impl=impl)),
            ref_solve, rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(linalg.tri_inverse(L, impl=impl)),
            ref_inv, rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(linalg.cholesky_solve(L, rhs, impl=impl)),
            ref_cho, rtol=2e-4, atol=2e-3,
        )
    # Below the m-gate, 'pallas' falls back to XLA (no padding blow-up).
    Ls = jnp.asarray(_chol_factor(rng, B, 16))
    rs = jnp.asarray(rng.standard_normal((B, 16, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(linalg.tri_solve(Ls, rs, impl="pallas")),
        np.asarray(jsl.solve_triangular(Ls, rs, lower=True)),
        rtol=2e-4, atol=2e-4,
    )


def test_sharded_batch_solve_no_collectives(rng):
    """The custom_partitioning batch rule (with an XLA stand-in lower_fn, as
    in test_pallas_cholesky): batch-dim-sharded solves run per shard with no
    collectives in the compiled program."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device mesh")
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    f = pt._make_partitioned(
        lambda l, r: jsl.solve_triangular(l, r, lower=True),
        2, "... i j, ... i k -> ... i k", ("i", "j", "k"),
    )
    B, m, n = 8, 16, 4
    L = jnp.asarray(_chol_factor(rng, B, m))
    rhs = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    ref = np.asarray(jsl.solve_triangular(L, rhs, lower=True))
    for spec in (P("model", None, None), P(("data", "model"), None, None)):
        sh = NamedSharding(mesh, spec)
        l_s, r_s = jax.device_put(L, sh), jax.device_put(rhs, sh)
        compiled = jax.jit(f).lower(l_s, r_s).compile()
        out = compiled(l_s, r_s)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
        hlo = compiled.as_text()
        for bad in ("all-gather", "all-reduce", "all-to-all",
                    "collective-permute"):
            assert bad not in hlo, f"unexpected collective {bad} for {spec}"


def test_fits_vmem_gate():
    assert pt.fits_vmem(200, 200)
    assert pt.fits_vmem(200, 200, identity_rhs=True)
    # A 4k-wide RHS at m=512 blows the slab budget -> XLA fallback.
    assert not pt.fits_vmem(512, 4096)
    assert not linalg._trisolve_pallas_ok(
        "pallas", 512, 4096, 2, jnp.float32
    )
    # bf16 factors never take the kernel.
    assert not linalg._trisolve_pallas_ok(
        "pallas", 200, 200, 2, jnp.bfloat16
    )
    # 'auto' (the library default) NEVER dispatches to this kernel — the
    # step-level A/B measured it a regression at both profiled configs
    # (pallas_trisolve_step_ab.json); only an explicit 'pallas' opts in.
    assert linalg.get_cholesky_impl() == "auto"
    assert not linalg._trisolve_pallas_ok("auto", 200, 200, 14, jnp.float32)
    assert not linalg._trisolve_pallas_ok(None, 200, 200, 14, jnp.float32)
    assert linalg._trisolve_pallas_ok("pallas", 200, 200, 14, jnp.float32)
    try:
        # the deprecated global override opts every site in, including the
        # Pallas Cholesky VJP's trans-solves (impl=None resolution)
        linalg.set_cholesky_impl("pallas")
        assert linalg._trisolve_pallas_ok(None, 200, 200, 14, jnp.float32)
    finally:
        linalg.set_cholesky_impl("auto")
