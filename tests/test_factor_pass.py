"""Parity tests for the batched factor pass.

The per-step Cholesky work is merged into one probe + one final dispatch
(``ops.linalg.joint_factor_cholesky`` / ``models.core.compute_factors``).
Batch lanes of a Cholesky are independent, so the merged op must be
bit-identical per matrix to the per-site primitives it replaced; these tests
pin that, plus the layer-level equivalence of supplying precomputed factors
vs. letting each layer factor for itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spatial_alignment_tpu as sat
from spatial_alignment_tpu.models import core
from spatial_alignment_tpu.models.params import merge_hyperparams
from spatial_alignment_tpu.ops.linalg import (
    factor_psd_cholesky,
    jittered_cholesky,
    joint_factor_cholesky,
)

EPS = 1e-5


def _rand_spd(rng, n, batch=()):
    a = rng.standard_normal(batch + (n, n)).astype(np.float32)
    return (a @ np.swapaxes(a, -1, -2) + n * np.eye(n, dtype=np.float32)).astype(
        np.float32
    )


def test_joint_factor_matches_per_site_primitives(rng):
    gram = jnp.asarray(_rand_spd(rng, 24, batch=(3,)))
    sqt = jnp.asarray(rng.standard_normal((5, 24, 24)).astype(np.float32))
    Lg, Lp = joint_factor_cholesky(gram, sqt, EPS)
    Lg_ref = jittered_cholesky(gram, EPS)
    Lp_ref = factor_psd_cholesky(sqt, EPS)
    np.testing.assert_array_equal(np.asarray(Lg), np.asarray(Lg_ref))
    np.testing.assert_array_equal(np.asarray(Lp), np.asarray(Lp_ref))


def test_joint_factor_no_psd_slab(rng):
    gram = jnp.asarray(_rand_spd(rng, 16, batch=(2,)))
    Lg, Lp = joint_factor_cholesky(gram, None, EPS)
    assert Lp is None
    np.testing.assert_array_equal(
        np.asarray(Lg), np.asarray(jittered_cholesky(gram, EPS))
    )


def test_joint_factor_gradients_match(rng):
    gram_np = _rand_spd(rng, 12, batch=(2,))
    sqt_np = rng.standard_normal((3, 12, 12)).astype(np.float32)

    def loss_joint(g, s):
        Lg, Lp = joint_factor_cholesky(g, s, EPS)
        return jnp.sum(Lg**2) + jnp.sum(Lp**2)

    def loss_split(g, s):
        return jnp.sum(jittered_cholesky(g, EPS) ** 2) + jnp.sum(
            factor_psd_cholesky(s, EPS) ** 2
        )

    g_j = jax.grad(loss_joint, argnums=(0, 1))(
        jnp.asarray(gram_np), jnp.asarray(sqt_np)
    )
    g_s = jax.grad(loss_split, argnums=(0, 1))(
        jnp.asarray(gram_np), jnp.asarray(sqt_np)
    )
    for a, b in zip(g_j, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def _tiny_model(rng, *, fixed_view_idx=None, m_X=12, m_G=12, **spec_kw):
    n_per = 30
    X = rng.standard_normal((2 * n_per, 2)).astype(np.float32)
    Y = rng.standard_normal((2 * n_per, 4)).astype(np.float32)
    data_dict = {
        "expression": {
            "spatial_coords": X,
            "outputs": Y,
            "n_samples_list": [n_per, n_per],
        }
    }
    model = sat.VariationalGPSA(
        data_dict,
        m_X_per_view=m_X,
        m_G=m_G,
        n_latent_gps={"expression": 3},
        fixed_view_idx=fixed_view_idx,
        **spec_kw,
    )
    return model


@pytest.mark.parametrize("fixed_view_idx", [None, 0])
@pytest.mark.parametrize("m_G", [12, 16])
def test_layers_bitmatch_with_and_without_factor_pass(rng, fixed_view_idx, m_G):
    """warp/data layers given compute_factors output == their self-factored
    path, on both the square and mixed-size (m_X != m_G) graphs."""
    model = _tiny_model(rng, fixed_view_idx=fixed_view_idx, m_G=m_G)
    spec = model.spec
    hp = merge_hyperparams(model.params, model.consts)
    X_all, _ = core._concat_modalities(spec, model._batch)
    key = jax.random.PRNGKey(3)

    fp = core.compute_factors(spec, hp)
    mu_a, samp_a, aux_a = core.warp_layer(
        spec, hp, X_all, key, 2, factors=(fp.warp_Kuu_chol, fp.warp_Om_tril)
    )
    mu_b, samp_b, aux_b = core.warp_layer(spec, hp, X_all, key, 2, factors=None)
    np.testing.assert_array_equal(np.asarray(mu_a), np.asarray(mu_b))
    np.testing.assert_array_equal(np.asarray(samp_a), np.asarray(samp_b))
    np.testing.assert_array_equal(
        np.asarray(aux_a.Kuu_chol), np.asarray(aux_b.Kuu_chol)
    )
    np.testing.assert_array_equal(
        np.asarray(aux_a.Omega_tril), np.asarray(aux_b.Omega_tril)
    )

    G_samples = core._split_modalities(spec, samp_a, axis=2)
    k2 = jax.random.PRNGKey(7)
    Fl_a, Fo_a, daux_a = core.data_layer(
        spec, hp, G_samples, k2, factors=(fp.data_Kuu_chol, fp.data_Om_tril)
    )
    Fl_b, Fo_b, daux_b = core.data_layer(spec, hp, G_samples, k2, factors=None)
    for mod in spec.modality_names:
        np.testing.assert_array_equal(np.asarray(Fo_a[mod]), np.asarray(Fo_b[mod]))
        np.testing.assert_array_equal(np.asarray(Fl_a[mod]), np.asarray(Fl_b[mod]))


@pytest.mark.parametrize(
    "spec_kw",
    [{}, {"triangular_variational": True}, {"whitened_variational": True}],
)
def test_compute_factors_matches_primitives(rng, spec_kw):
    """FactorPass slabs == the per-site primitives for every parameterization."""
    model = _tiny_model(rng, fixed_view_idx=0, **spec_kw)
    spec = model.spec
    hp = merge_hyperparams(model.params, model.consts)
    fp = core.compute_factors(spec, hp)

    active = core._active_views(spec)
    Kuu_w, Om_w_sqt = core._warp_grams(spec, hp, active)
    np.testing.assert_array_equal(
        np.asarray(fp.warp_Kuu_chol),
        np.asarray(jittered_cholesky(Kuu_w, spec.diagonal_offset)),
    )
    Kuu_d = core._data_gram(spec, hp)
    np.testing.assert_array_equal(
        np.asarray(fp.data_Kuu_chol),
        np.asarray(jittered_cholesky(Kuu_d, spec.diagonal_offset)),
    )
    tril_mode = spec.triangular_variational or spec.whitened_variational
    if tril_mode:
        np.testing.assert_array_equal(
            np.asarray(fp.warp_Om_tril), np.asarray(jnp.tril(Om_w_sqt))
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(fp.warp_Om_tril),
            np.asarray(factor_psd_cholesky(Om_w_sqt, spec.diagonal_offset)),
        )
    for mod in spec.modality_names:
        sqt = hp["Omega_sqt_F"][mod]
        want = (
            jnp.tril(sqt) if tril_mode else factor_psd_cholesky(sqt, spec.diagonal_offset)
        )
        np.testing.assert_array_equal(
            np.asarray(fp.data_Om_tril[mod]), np.asarray(want)
        )


@pytest.mark.parametrize("fixed_view_idx", [None, 0])
def test_unmerged_dispatch_elbo_matches_merged(rng, fixed_view_idx):
    """spec.merged_factor_dispatch=False (the distributed layout) computes the
    same ELBO and gradients as the merged single-chip default. Per-lane math
    is bit-identical; only the KL's sum-over-terms grouping differs, so the
    comparison is float-tight rather than bitwise."""
    import dataclasses

    model = _tiny_model(rng, fixed_view_idx=fixed_view_idx)
    spec_m = model.spec
    spec_u = dataclasses.replace(spec_m, merged_factor_dispatch=False)
    key = jax.random.PRNGKey(11)

    def loss(spec, p):
        return core.negative_elbo(spec, p, model.consts, model._batch, key, 3)

    lm, gm = jax.value_and_grad(lambda p: loss(spec_m, p))(model.params)
    lu, gu = jax.value_and_grad(lambda p: loss(spec_u, p))(model.params)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lu), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(gm)[0],
        jax.tree_util.tree_flatten_with_path(gu)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a),
            np.asarray(b),
            rtol=5e-5,
            atol=1e-6 * max(1.0, float(np.abs(np.asarray(a)).max())),
            err_msg=jax.tree_util.keystr(pa),
        )
