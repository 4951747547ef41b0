"""Fused quad-diag kernel (ops/pallas_quad.py): numerics vs the inline jnp
form, custom-VJP gradients, vmap, padding exactness, and dispatch gates.

Kernel semantics target: core._quad_diag's contraction (the SVGP variance
quadratic forms, reference torch.einsum at
/root/reference/gpsa/models/vgpsa.py:196-204). Runs in interpret mode on the
CPU suite; real-TPU numerics + the step-level A/B live in
experiments/out/quad_pallas_step_ab.json.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_alignment_tpu.ops import pallas_quad as pq


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


def _pal(x, F, precision="highest", tile=16):
    return pq.quad_diag(x, F, precision, True, tile, True)  # force, interpret


@pytest.mark.parametrize(
    "lead,N,m,L",
    [((3,), 40, 12, 4), ((2, 3), 17, 9, 2), ((), 33, 8, 3)],
)
def test_forward_matches_jnp(rng, lead, N, m, L):
    x = _rand(rng, lead + (N, m))
    F = _rand(rng, (L, m, m), 0.3)
    got = _pal(x, F)
    want = pq._quad_jnp(x, F, "highest")
    assert got.shape == lead + (L, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=1e-6)


def test_vjp_matches_jnp_autodiff(rng):
    x = _rand(rng, (3, 40, 12))
    F = _rand(rng, (4, 12, 12), 0.3)
    g = _rand(rng, (3, 4, 40))
    f_pal = lambda a, b: jnp.vdot(_pal(a, b), g)
    f_jnp = lambda a, b: jnp.vdot(pq._quad_jnp(a, b, "highest"), g)
    gx1, gF1 = jax.grad(f_pal, argnums=(0, 1))(x, F)
    gx2, gF2 = jax.grad(f_jnp, argnums=(0, 1))(x, F)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gF1), np.asarray(gF2),
                               rtol=3e-5, atol=3e-5)


def test_point_padding_exact(rng):
    """N not a multiple of the tile: padded rows must contribute exactly
    nothing (zero rows of x -> zero rows of t)."""
    x = _rand(rng, (2, 19, 8))
    F = _rand(rng, (3, 8, 8), 0.3)
    got = _pal(x, F, tile=16)  # 19 -> two tiles of 16 with 13 padded rows
    want = pq._quad_jnp(x, F, "highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=1e-6)


def test_vmap_folds_like_jnp(rng):
    """Warp-layer pattern: vmap over views maps BOTH operands."""
    xv = _rand(rng, (2, 20, 8))
    Fv = _rand(rng, (2, 3, 8, 8), 0.3)
    got = jax.vmap(lambda a, b: _pal(a, b))(xv, Fv)
    want = jax.vmap(lambda a, b: pq._quad_jnp(a, b, "highest"))(xv, Fv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=1e-6)


def test_dispatch_gates(rng):
    small_x = jnp.zeros((5, 40, 12), jnp.float32)
    big_x = jnp.zeros((5, 4050, 200), jnp.float32)
    F10 = jnp.zeros((10, 200, 200), jnp.float32)
    F_small = jnp.zeros((4, 12, 12), jnp.float32)
    # size gate: small slabs stay on the inline jnp path
    assert not pq.would_dispatch(small_x, F_small)
    # the Visium-scale slab is above the floor — applicability then depends
    # on the backend (TPU only)
    elems = 5 * 4050 * 10 * 200
    assert elems >= pq.QUAD_PALLAS_MIN_ELEMS
    assert pq.would_dispatch(big_x, F10) == (
        jax.default_backend() == "tpu"
    )
    # impl pins win over everything (distribute() uses "xla")
    assert not pq.would_dispatch(big_x, F10, impl="xla")
    # non-f32 dtypes and batched factors never dispatch
    assert not pq.would_dispatch(big_x.astype(jnp.bfloat16), F10, "pallas")
    assert not pq.would_dispatch(
        big_x, F10[None].repeat(2, 0), "pallas"
    )
    # force override is trace-time global; restore it
    pq.set_quad_force(False)
    try:
        assert not pq.would_dispatch(big_x, F10)
    finally:
        pq.set_quad_force(None)


def test_core_quad_diag_unchanged_on_small_shapes(rng):
    """core._quad_diag must stay bit-identical to the inline jnp form below
    the dispatch floor (the whole CPU suite's regime)."""
    from spatial_alignment_tpu.models.core import _quad_diag

    x = _rand(rng, (3, 25, 10))
    F = _rand(rng, (4, 10, 10), 0.3)
    got = _quad_diag(x, F, "highest")
    want = pq._quad_jnp(x, F, "highest")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_spec_field_round_trip(two_view_data=None):
    import spatial_alignment_tpu as sat
    from spatial_alignment_tpu.models.spec import spec_from_dict, spec_to_dict
    from conftest import make_two_view_data

    dd = make_two_view_data(n_per_view=12, n_outputs=2)
    m = sat.VariationalGPSA(dd, m_X_per_view=6, m_G=6,
                            n_latent_gps={"expression": None}, seed=0)
    # "auto" resolves at build time to the measured winner ("xla" — the
    # kernel lost its step A/B, quad_pallas_step_ab.json); the spec stores
    # the resolved value.
    assert m.spec.quad_diag_impl == "xla"
    d = spec_to_dict(m.spec)
    assert spec_from_dict(d) == m.spec
    d.pop("quad_diag_impl")  # old manifests load with the default
    assert spec_from_dict(d).quad_diag_impl == "xla"
    m2 = sat.VariationalGPSA(dd, m_X_per_view=6, m_G=6,
                             n_latent_gps={"expression": None}, seed=0,
                             quad_diag_impl="pallas")
    assert m2.spec.quad_diag_impl == "pallas"
    with pytest.raises(ValueError):
        sat.VariationalGPSA(dd, m_X_per_view=6, m_G=6,
                            n_latent_gps={"expression": None}, seed=0,
                            quad_diag_impl="bogus")


def test_distribute_pins_xla():
    """distribute() must pin the sharded model's spec to 'xla' without
    touching any process-global state (a fresh model keeps its own
    explicit choice — here the opt-in 'pallas')."""
    import spatial_alignment_tpu as sat
    from spatial_alignment_tpu.parallel.sharding import distribute, make_mesh
    from conftest import make_two_view_data

    dd = make_two_view_data(n_per_view=16, n_outputs=4)
    m = sat.VariationalGPSA(dd, m_X_per_view=6, m_G=6,
                            n_latent_gps={"expression": 2}, seed=0,
                            pad_multiple=8, quad_diag_impl="pallas")
    mesh = make_mesh(4, 2)
    distribute(m, mesh)
    assert m.spec.quad_diag_impl == "xla"
    m2 = sat.VariationalGPSA(dd, m_X_per_view=6, m_G=6,
                             n_latent_gps={"expression": 2}, seed=0,
                             quad_diag_impl="pallas")
    assert m2.spec.quad_diag_impl == "pallas"
