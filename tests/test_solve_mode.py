"""svgp_solve_mode: explicit chol(Kuu)^-1 shared across the step.

"kl_inverse" (the auto default at scale) reuses one width-m inverse for the
KL's prior solve; opt-in "inverse" also applies it in the SVGP predictive
(fastest, but measured median 14.6x worse converged alignment at m=200 —
experiments/out/solve_mode_convergence_ab.json). These tests pin:

  * tri_inverse values + its gradient against the autodiff'd solve-vs-I
    (a regression pin: a matmul-only custom VJP was measured harmful and
    removed — see the tri_inverse docstring),
  * kl_mvn_chol with a precomputed prior inverse == the solve form,
  * svgp_mean_var / full-ELBO / gradient parity across all three modes and
    the parameterization grid (square / triangular / whitened / analytic
    likelihood / template views),
  * the build_spec "auto" gate and checkpoint-manifest compatibility,
  * distributed (pjit) parity when inverse mode is forced on the mesh.

All modes are algebraically identical (bit-equal in f64); f32 parity is
float-level, not bit-exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import pytest

import spatial_alignment_tpu as sat
from spatial_alignment_tpu.models import core
from spatial_alignment_tpu.models.spec import build_spec, spec_from_dict, spec_to_dict
from spatial_alignment_tpu.ops.linalg import kl_mvn_chol, tri_inverse

from conftest import make_two_view_data


def _tril(rng, shape, boost=3.0):
    L = np.tril(rng.standard_normal(shape)).astype(np.float32)
    return L + boost * np.eye(shape[-1], dtype=np.float32)


def test_tri_inverse_values():
    rng = np.random.default_rng(0)
    for shape in [(5, 5), (4, 7, 7)]:
        L = _tril(rng, shape)
        inv = np.asarray(tri_inverse(jnp.asarray(L)))
        np.testing.assert_allclose(
            inv @ L, np.broadcast_to(np.eye(shape[-1]), shape), atol=1e-5
        )


def test_tri_inverse_grad_matches_autodiff_solve():
    rng = np.random.default_rng(1)
    for shape in [(6, 6), (3, 6, 6)]:
        L = jnp.asarray(_tril(rng, shape))
        cot = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

        def ref(Lm):
            eye = jnp.broadcast_to(jnp.eye(shape[-1], dtype=Lm.dtype), Lm.shape)
            return jsl.solve_triangular(Lm, eye, lower=True)

        g_custom = jax.grad(lambda Lm: jnp.sum(tri_inverse(Lm) * cot))(L)
        g_ref = jax.grad(lambda Lm: jnp.sum(ref(Lm) * cot))(L)
        np.testing.assert_allclose(
            np.asarray(g_custom), np.asarray(g_ref), rtol=1e-5, atol=1e-5
        )


def test_kl_mvn_chol_with_prior_inverse():
    rng = np.random.default_rng(2)
    B, m = 5, 12
    Lq = jnp.asarray(_tril(rng, (B, m, m), boost=2.0))
    Lp = jnp.asarray(_tril(rng, (B, m, m), boost=2.0))
    mu_q = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))
    mu_p = jnp.asarray(rng.standard_normal((B, m)).astype(np.float32))
    kl_solve = kl_mvn_chol(mu_q, Lq, mu_p, Lp)
    kl_inv = kl_mvn_chol(mu_q, Lq, mu_p, Lp, chol_p_inv=tri_inverse(Lp))
    np.testing.assert_allclose(
        np.asarray(kl_solve), np.asarray(kl_inv), rtol=1e-5
    )


def test_svgp_mean_var_inverse_matches_solve():
    rng = np.random.default_rng(3)
    m, N, S, B, C = 20, 80, 3, 4, 2
    A = rng.standard_normal((m, m)).astype(np.float32)
    L = jnp.asarray(np.linalg.cholesky(A @ A.T + m * np.eye(m, dtype=np.float32)))
    Kuf = jnp.asarray(rng.standard_normal((S, m, N)).astype(np.float32))
    kff = jnp.asarray(np.abs(rng.standard_normal((S, N))).astype(np.float32) + 5)
    mu_x = jnp.asarray(rng.standard_normal((S, N, C)).astype(np.float32))
    mu_z = jnp.asarray(rng.standard_normal((m, C)).astype(np.float32))
    delta = jnp.asarray(rng.standard_normal((m, C)).astype(np.float32))
    Om = jnp.asarray(np.tril(rng.standard_normal((B, m, m))).astype(np.float32))

    out = {
        mode: core.svgp_mean_var(
            kff, Kuf, L, mu_x, mu_z, delta, Om, 1e-5, solve_mode=mode
        )
        for mode in ("solve", "inverse", "mixed")
    }
    for other in ("inverse", "mixed"):
        for a, b in zip(out["solve"], out[other]):
            scale = float(jnp.max(jnp.abs(a)))
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-6 * max(scale, 1.0)
            )
    # Precomputed inverse == internally computed inverse (bit-exact: same ops)
    pre = core.svgp_mean_var(
        kff, Kuf, L, mu_x, mu_z, delta, Om, 1e-5,
        solve_mode="inverse", Kuu_inv=tri_inverse(L),
    )
    for a, b in zip(out["inverse"], pre):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"fixed_view_idx": 0},
        {"triangular_variational": True},
        {"whitened_variational": True},
        {"analytic_data_likelihood": True},
    ],
    ids=["square", "template", "triangular", "whitened", "analytic"],
)
def test_negative_elbo_parity_between_modes(kw):
    data = make_two_view_data(n_per_view=30, n_outputs=4)
    models = {
        mode: sat.VariationalGPSA(
            data, m_X_per_view=8, m_G=8, n_latent_gps={"expression": 3},
            seed=0, svgp_solve_mode=mode, **kw,
        )
        for mode in ("solve", "kl_inverse", "inverse", "mixed")
    }
    key = jax.random.PRNGKey(7)
    vals = {}
    grads = {}
    for mode, m in models.items():
        f = lambda p: core.negative_elbo(m.spec, p, m.consts, m._batch, key, 4)
        vals[mode] = float(f(m.params))
        grads[mode] = jax.tree.leaves(jax.grad(f)(m.params))
    gs = jnp.concatenate([jnp.ravel(g) for g in grads["solve"]])
    for other in ("kl_inverse", "inverse", "mixed"):
        np.testing.assert_allclose(vals["solve"], vals[other], rtol=1e-4)
        gi = jnp.concatenate([jnp.ravel(g) for g in grads[other]])
        # global-norm relative: per-leaf comparisons amplify f32 noise in
        # near-zero leaves (both modes are equally far from the f64 oracle)
        assert float(jnp.linalg.norm(gs - gi) / jnp.linalg.norm(gs)) < 2e-3


def test_inverse_mode_fit_and_predict_improve_alignment():
    data = make_two_view_data(n_per_view=40, n_outputs=4, warp_sigma=0.3)
    model = sat.VariationalGPSA(
        data, m_X_per_view=10, m_G=10, n_latent_gps={"expression": None},
        fixed_view_idx=0, seed=0, svgp_solve_mode="inverse",
    )
    losses = model.fit(n_epochs=500, lr=1e-2, S=3)
    assert np.all(np.isfinite(losses)) and losses[-1] < losses[0]
    X = np.concatenate([data["expression"]["spatial_coords"]])
    G, _, _ = model.predict({"expression": X})
    assert np.all(np.isfinite(G["expression"]))


def test_inverse_mode_minibatch_fit_runs():
    data = make_two_view_data(n_per_view=48, n_outputs=3)
    model = sat.VariationalGPSA(
        data, m_X_per_view=8, m_G=8, n_latent_gps={"expression": None},
        seed=0, svgp_solve_mode="inverse",
    )
    losses = model.fit(n_epochs=120, lr=1e-2, S=3, minibatch_size=16)
    assert np.all(np.isfinite(losses))


def test_build_spec_auto_gate_and_validation():
    # "auto" resolves to mixed at scale (m >= 64 or >= 2000 points; +7-14%
    # steps/s, accuracy gates in solve_mode_{convergence,smallm}_ab.json)
    # and kl_inverse at the smallest configs (where mixed's extra dispatches
    # measured 0.91x — solve_prng_step_ab.json).
    small = make_two_view_data(n_per_view=30, n_outputs=2)
    spec_small = build_spec(small, m_X_per_view=5, m_G=5)
    assert spec_small.svgp_solve_mode == "kl_inverse"
    assert build_spec(
        small, m_X_per_view=5, m_G=5, svgp_solve_mode="solve"
    ).svgp_solve_mode == "solve"
    # m-gate: either inducing count >= 64 flips to mixed.
    assert build_spec(small, m_X_per_view=64, m_G=5).svgp_solve_mode == "mixed"
    assert build_spec(small, m_X_per_view=5, m_G=64).svgp_solve_mode == "mixed"
    # N-gate: >= 2000 total points flips to mixed even at small m.
    big = make_two_view_data(n_per_view=1000, n_outputs=2)
    assert build_spec(big, m_X_per_view=5, m_G=5).svgp_solve_mode == "mixed"

    with pytest.raises(ValueError):
        build_spec(small, m_X_per_view=5, m_G=5, svgp_solve_mode="bogus")


def test_spec_dict_round_trip_and_old_manifest_compat():
    data = make_two_view_data(n_per_view=20, n_outputs=2)
    spec = build_spec(data, m_X_per_view=5, m_G=5, svgp_solve_mode="inverse")
    d = spec_to_dict(spec)
    assert d["svgp_solve_mode"] == "inverse"
    assert spec_from_dict(d) == spec
    # Old (pre-field) manifests load with the backward-compatible default.
    d.pop("svgp_solve_mode")
    assert spec_from_dict(d).svgp_solve_mode == "solve"


@pytest.mark.parametrize("mode", ["inverse", "mixed"])
def test_distributed_inverse_mode_matches_single_device(mode):
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from spatial_alignment_tpu.parallel import distribute, make_mesh

    data = make_two_view_data(n_per_view=24, n_outputs=4)
    kw = dict(
        m_X_per_view=6, m_G=6, n_latent_gps={"expression": 3}, seed=0,
        svgp_solve_mode=mode,
    )
    m_single = sat.VariationalGPSA(data, **kw)
    m_shard = sat.VariationalGPSA(data, pad_multiple=4, **kw)
    distribute(m_shard, make_mesh(4))
    key = jax.random.PRNGKey(3)
    e1 = float(core.negative_elbo(
        m_single.spec, m_single.params, m_single.consts, m_single._batch, key, 3
    ))
    e2 = float(core.negative_elbo(
        m_shard.spec, m_shard.params, m_shard.consts, m_shard._batch, key, 3
    ))
    np.testing.assert_allclose(e1, e2, rtol=2e-4)

    step, opt_state = m_shard.make_train_step(lr=1e-2, S=2)
    params, loss0 = m_shard.params, None
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(params)
    )
