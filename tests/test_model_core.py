"""Model-core tests: SVGP predictive math vs dense numpy, layer shapes,
fixed-view passthrough, padding/masking exactness (SURVEY.md §4 tier 1-2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spatial_alignment_tpu as sat
from spatial_alignment_tpu.models import core
from spatial_alignment_tpu.models.params import merge_hyperparams
from spatial_alignment_tpu.ops.kernels import rbf_kernel_numpy

from conftest import make_two_view_data


def _dense_svgp(kff, Kuf, Kuu, mu_x, mu_z, delta, Omegas, eps):
    """Float64 numpy transliteration of the reference compute_mean_and_var
    (vgpsa.py:174-204)."""
    alpha = np.linalg.solve(Kuu, Kuf)  # (m, n)
    aKa = np.diag(Kuf.T @ alpha)  # diag(Kfu Kuu^-1 Kuf)
    mu = mu_x + alpha.T @ (delta - mu_z)
    sig = np.stack(
        [kff - aKa + np.einsum("nm,mk,nk->n", alpha.T, Om, alpha.T) for Om in Omegas]
    )
    return mu, sig + 2 * eps


def test_svgp_mean_var_matches_dense(rng):
    m, n, D = 8, 12, 2
    eps = 1e-5
    Xt = rng.uniform(0, 5, (m, D))
    X = rng.uniform(0, 5, (n, D))
    params = np.array([0.2, 0.4])  # log var, log ls
    Kuu = rbf_kernel_numpy(Xt, Xt, params) + eps * np.eye(m)
    Kuf = rbf_kernel_numpy(Xt, X, params)
    kff = np.exp(0.2) * np.ones(n)
    mu_x = rng.standard_normal((n, D))
    mu_z = rng.standard_normal((m, D))
    delta = rng.standard_normal((m, D))
    A = rng.standard_normal((D, m, m)) * 0.3
    Omegas = A @ np.swapaxes(A, -1, -2) + eps * np.eye(m)

    want_mu, want_sig = _dense_svgp(kff, Kuf, Kuu, mu_x, mu_z, delta, Omegas, eps)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    got_mu, got_sig = core.svgp_mean_var(
        f32(kff),
        f32(Kuf),
        jnp.linalg.cholesky(f32(Kuu)),
        f32(mu_x),
        f32(mu_z),
        f32(delta),
        jnp.linalg.cholesky(f32(Omegas)),
        eps,
    )
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_sig), want_sig, rtol=1e-3, atol=1e-4)


def test_svgp_mean_var_sample_batched(rng):
    """S-batched path (data layer): matches per-slice unbatched results."""
    S, m, n, L = 3, 6, 9, 2
    eps = 1e-5
    Xt = rng.uniform(0, 5, (m, 2))
    Kuu = rbf_kernel_numpy(Xt, Xt, [0.1, 0.3]) + eps * np.eye(m)
    Lc = jnp.linalg.cholesky(jnp.asarray(Kuu, jnp.float32))
    Kuf = rng.uniform(0.1, 1.0, (S, m, n)).astype(np.float32)
    kff = np.exp(0.1) * np.ones((S, n), np.float32)
    delta = rng.standard_normal((m, L)).astype(np.float32)
    A = (rng.standard_normal((L, m, m)) * 0.3).astype(np.float32)
    Om = A @ np.swapaxes(A, -1, -2) + eps * np.eye(m, dtype=np.float32)
    Om_tril = jnp.linalg.cholesky(jnp.asarray(Om))

    mu_b, sig_b = core.svgp_mean_var(
        jnp.asarray(kff), jnp.asarray(Kuf), Lc,
        jnp.zeros(()), jnp.zeros(()), jnp.asarray(delta), Om_tril, eps,
    )
    assert mu_b.shape == (S, n, L)
    assert sig_b.shape == (S, L, n)
    for s in range(S):
        mu_s, sig_s = core.svgp_mean_var(
            jnp.asarray(kff[s]), jnp.asarray(Kuf[s]), Lc,
            jnp.zeros(()), jnp.zeros(()), jnp.asarray(delta), Om_tril, eps,
        )
        np.testing.assert_allclose(np.asarray(mu_b[s]), np.asarray(mu_s), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sig_b[s]), np.asarray(sig_s), rtol=1e-5)


def _tiny_model(data_dict, **kw):
    kw.setdefault("m_X_per_view", 8)
    kw.setdefault("m_G", 8)
    kw.setdefault("n_latent_gps", {m: None for m in data_dict})
    return sat.VariationalGPSA(data_dict, **kw)


def test_forward_shapes_reference_layout(two_view_data):
    model = _tiny_model(two_view_data)
    vi, Ns, Ps, n_total = model.create_view_idx_dict(two_view_data)
    assert Ns == {"expression": 60} and Ps == {"expression": 3} and n_total == 60
    G_means, G_samples, F_lat, F_obs = model.forward(
        {"expression": two_view_data["expression"]["spatial_coords"]}, vi, Ns, S=4
    )
    assert G_means["expression"].shape == (60, 2)
    assert G_samples["expression"].shape == (4, 60, 2)
    assert F_lat["expression"].shape == (4, 60, 3)
    assert F_obs["expression"].shape == (4, 60, 3)


def test_fixed_view_passthrough_exact(two_view_data):
    X = two_view_data["expression"]["spatial_coords"]
    model = _tiny_model(two_view_data, fixed_view_idx=0)
    model.fit(5, S=2)  # at init the warp is exactly identity; move off it
    G_means, G_samples, _, _ = model.forward({"expression": X}, S=3)
    np.testing.assert_array_equal(G_means["expression"][:30], X[:30])
    # all S samples pass through too (vgpsa.py:271)
    for s in range(3):
        np.testing.assert_array_equal(G_samples["expression"][s, :30], X[:30])
    # non-fixed view is actually warped (not passthrough)
    assert not np.allclose(G_means["expression"][30:], X[30:])


def test_fixed_view_iterable(two_view_data):
    X = two_view_data["expression"]["spatial_coords"]
    model = _tiny_model(two_view_data, fixed_view_idx=[0, 1])
    G_means, _, _, _ = model.forward({"expression": X}, S=1)
    np.testing.assert_array_equal(G_means["expression"], X)


def test_lmc_shapes(two_view_data):
    model = _tiny_model(two_view_data, n_latent_gps={"expression": 2})
    X = two_view_data["expression"]["spatial_coords"]
    _, _, F_lat, F_obs = model.forward({"expression": X}, S=2)
    assert F_lat["expression"].shape == (2, 60, 2)  # L latent GPs
    assert F_obs["expression"].shape == (2, 60, 3)  # mixed up to P outputs
    assert model.params["W"]["expression"].shape == (2, 3)


def test_multimodal_bookkeeping(rng):
    data = make_two_view_data(n_per_view=20, n_outputs=3)
    h = make_two_view_data(n_per_view=12, n_outputs=4, seed=1)
    data["histology"] = h["expression"]
    model = _tiny_model(data, n_noise_variance_params=3)
    vi, Ns, Ps, n_total = model.create_view_idx_dict(data)
    assert Ns == {"expression": 40, "histology": 24}
    assert Ps == {"expression": 3, "histology": 4}
    assert n_total == 64
    X = {m: data[m]["spatial_coords"] for m in data}
    G_means, G_samples, F_lat, F_obs = model.forward(X, vi, Ns, S=2)
    assert G_means["expression"].shape == (40, 2)
    assert G_means["histology"].shape == (24, 2)
    assert F_obs["histology"].shape == (2, 24, 4)
    loss = model.loss_fn(data, F_obs)
    assert np.isfinite(float(loss))


def test_ragged_views_padding_masked(rng):
    """Views of different sizes: padded compute must equal an unpadded
    equivalent. We check that the padded model produces finite loss and that
    the ELBO matches a same-data model where padding is forced larger."""
    n1, n2 = 17, 9
    X1 = rng.uniform(0, 10, (n1, 2)).astype(np.float32)
    X2 = rng.uniform(0, 10, (n2, 2)).astype(np.float32)
    Y1 = rng.standard_normal((n1, 3)).astype(np.float32)
    Y2 = rng.standard_normal((n2, 3)).astype(np.float32)
    data = {
        "expression": {
            "spatial_coords": np.concatenate([X1, X2]),
            "outputs": np.concatenate([Y1, Y2]),
            "n_samples_list": [n1, n2],
        }
    }
    m1 = _tiny_model(data, seed=3)
    m2 = _tiny_model(data, seed=3, pad_multiple=8)  # n_padded 17 -> 24
    assert m2.spec.modality("expression").n_padded == 24
    key = jax.random.PRNGKey(0)
    # Means must be identical regardless of padding (samples differ because
    # the noise tensor shape differs with padding).
    X = data["expression"]["spatial_coords"]
    g1 = m1.forward({"expression": X}, S=1, key=key)[0]["expression"]
    g2 = m2.forward({"expression": X}, S=1, key=key)[0]["expression"]
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_prediction_mode_new_coords(two_view_data, rng):
    """Held-out prediction: forward on fresh coords with its own view_idx/Ns
    (reference pattern: two_dimensional_prediction.py:199-207)."""
    model = _tiny_model(two_view_data)
    n_test = 11
    X_test = np.concatenate(
        [rng.uniform(0, 10, (n_test, 2)), rng.uniform(0, 10, (n_test, 2))]
    ).astype(np.float32)
    test_dict = {
        "expression": {
            "spatial_coords": X_test,
            "outputs": np.zeros((2 * n_test, 3), np.float32),
            "n_samples_list": [n_test, n_test],
        }
    }
    vi_t, Ns_t, _, _ = model.create_view_idx_dict(test_dict)
    G_means, G_samples, F_lat, F_obs = model.forward(
        {"expression": X_test}, vi_t, Ns_t, S=5, prediction_mode=True
    )
    assert G_means["expression"].shape == (2 * n_test, 2)
    assert F_obs["expression"].shape == (5, 2 * n_test, 3)
    assert np.isfinite(F_obs["expression"]).all()


def test_g_test_imputation(two_view_data):
    """G_test imputation branch (vgpsa.py:438-477): choose aligned coords."""
    model = _tiny_model(two_view_data)
    X = two_view_data["expression"]["spatial_coords"]
    grid = np.stack(
        np.meshgrid(np.linspace(0, 10, 4), np.linspace(0, 10, 4)), -1
    ).reshape(1, -1, 2).astype(np.float32)
    out = model.forward({"expression": X}, S=2, G_test={"expression": grid})
    assert len(out) == 6
    _, _, _, _, F_lat_t, F_obs_t = out
    assert F_lat_t["expression"].shape == (2, 16, 3)
    assert F_obs_t["expression"].shape == (2, 16, 3)
    assert np.isfinite(F_obs_t["expression"]).all()


def test_mean_function_variants(two_view_data):
    for mf in ("identity_fixed", "identity_initialized", "linear"):
        model = _tiny_model(two_view_data, mean_function=mf)
        trainable = "mean_slopes" in model.params
        assert trainable == (mf != "identity_fixed")
        X = two_view_data["expression"]["spatial_coords"]
        G_means, _, _, _ = model.forward({"expression": X}, S=1)
        assert np.isfinite(G_means["expression"]).all()


def test_fixed_kernel_hyperparams(two_view_data):
    model = _tiny_model(
        two_view_data,
        fixed_warp_kernel_variances=[0.5, 0.5],
        fixed_warp_kernel_lengthscales=[10.0, 10.0],
        fixed_data_kernel_lengthscales=1.0,
    )
    assert "warp_kernel_variances" not in model.params
    np.testing.assert_allclose(
        np.asarray(model.consts["warp_kernel_variances"]), np.log(0.5), rtol=1e-5
    )
    # frozen leaves stay fixed through training
    before = np.asarray(model.consts["warp_kernel_lengthscales"]).copy()
    model.fit(3, S=2)
    np.testing.assert_array_equal(np.asarray(model.consts["warp_kernel_lengthscales"]), before)


def test_matern_kernels_run(two_view_data):
    model = _tiny_model(
        two_view_data, kernel_func_warp="matern12", kernel_func_data="matern32"
    )
    assert np.isfinite(model.neg_elbo(S=2))


def test_grid_init_rounds_to_square(two_view_data):
    model = _tiny_model(two_view_data, data_init=False, grid_init=True, m_G=10)
    # 10 -> ceil(sqrt(10))^2 = 16 (parity: vgpsa.py:105-107)
    assert model.m_G == 16 and model.m_X_per_view == 16
    assert model.Gtilde.shape == (16, 2)


def test_data_chunking_bit_identical(two_view_data):
    """Chunked data layer must reproduce the unchunked forward exactly."""
    import jax

    m1 = _tiny_model(two_view_data, seed=2)
    m2 = _tiny_model(two_view_data, seed=2, data_chunk_size=16)  # N=60 -> chunks of 15
    assert m2.spec.data_chunk_size == 16
    key = jax.random.PRNGKey(5)
    X = two_view_data["expression"]["spatial_coords"]
    out1 = m1.forward({"expression": X}, S=3, key=key)
    out2 = m2.forward({"expression": X}, S=3, key=key)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(
            a["expression"], b["expression"], rtol=1e-5, atol=1e-6
        )


def test_data_chunking_gradients_match(two_view_data):
    import jax
    from spatial_alignment_tpu.models import core

    m1 = _tiny_model(two_view_data, seed=2)
    m2 = _tiny_model(two_view_data, seed=2, data_chunk_size=16)
    key = jax.random.PRNGKey(5)
    g1 = jax.grad(lambda p: core.negative_elbo(m1.spec, p, m1.consts, m1._batch, key, 2))(m1.params)
    g2 = jax.grad(lambda p: core.negative_elbo(m2.spec, p, m2.consts, m2._batch, key, 2))(m2.params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # f32 accumulation order differs between the chunked and fused paths
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4)


def test_quad_diag_remat_value_and_grads_match(two_view_data, monkeypatch):
    """Rematerializing the variance-projection intermediate (the optional
    jax.checkpoint path in svgp_mean_var — off by default, measured 0.91x at
    the Visium config) must not change the loss or gradients: checkpoint
    replays the identical ops in the backward pass."""
    import jax
    from spatial_alignment_tpu.models import core

    model = _tiny_model(two_view_data, seed=2)
    key = jax.random.PRNGKey(5)
    f = lambda p: core.negative_elbo(model.spec, p, model.consts, model._batch, key, 2)
    monkeypatch.setattr(core, "_REMAT_QUAD_MIN_ELEMS", 1 << 62)  # force OFF
    l_off, g_off = jax.value_and_grad(f)(model.params)
    monkeypatch.setattr(core, "_REMAT_QUAD_MIN_ELEMS", 1)  # force ON everywhere
    l_on, g_on = jax.value_and_grad(f)(model.params)
    # jax.checkpoint changes the jaxpr, so XLA may fuse the forward
    # differently across versions — tight tolerance, not bit-exactness.
    np.testing.assert_allclose(float(l_off), float(l_on), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_quad_diag_remat_all_solve_modes(two_view_data, monkeypatch):
    """Every svgp_mean_var branch (solve/kl_inverse/inverse/mixed/whitened/
    triangular) routes its quadratic form through the remat helper; forcing
    remat on must leave each mode's loss unchanged."""
    import jax
    from spatial_alignment_tpu.models import core

    key = jax.random.PRNGKey(5)
    variants = [
        dict(svgp_solve_mode="solve"),
        dict(svgp_solve_mode="kl_inverse"),
        dict(svgp_solve_mode="inverse"),
        dict(svgp_solve_mode="mixed"),
        dict(whitened_variational=True),
        dict(triangular_variational=True),
    ]
    for kw in variants:
        model = _tiny_model(two_view_data, seed=2, **kw)
        f = lambda p: core.negative_elbo(
            model.spec, p, model.consts, model._batch, key, 2
        )
        monkeypatch.setattr(core, "_REMAT_QUAD_MIN_ELEMS", 1 << 62)
        l_off = float(f(model.params))
        monkeypatch.setattr(core, "_REMAT_QUAD_MIN_ELEMS", 1)
        l_on = float(f(model.params))
        assert l_off == l_on, kw


def test_predict_mean_matches_sample_average(two_view_data):
    """predict() must equal the S->inf average of sampled forward outputs."""
    model = _tiny_model(two_view_data, n_latent_gps={"expression": 2}, seed=1)
    model.fit(20, S=2)
    X = two_view_data["expression"]["spatial_coords"]
    G_means, F_mean, F_var = model.predict({"expression": X})
    assert G_means["expression"].shape == (60, 2)
    assert F_mean["expression"].shape == (60, 3)
    assert (F_var["expression"] > 0).all()
    # Monte-Carlo check: average many sampled forwards
    acc = []
    for i in range(40):
        out = model.forward({"expression": X}, S=8, key=jax.random.PRNGKey(i))
        acc.append(np.asarray(out[3]["expression"]).mean(axis=0))
    mc_mean = np.mean(acc, axis=0)
    resid = np.abs(mc_mean - F_mean["expression"]).mean()
    spread = np.abs(mc_mean).mean()
    assert resid < 0.05 * spread + 0.05, (resid, spread)


def test_predict_on_new_coords(two_view_data, rng):
    model = _tiny_model(two_view_data)
    model.fit(10, S=2)
    n_test = 9
    X_test = rng.uniform(0, 10, (2 * n_test, 2)).astype(np.float32)
    vi = {"expression": [np.arange(n_test), np.arange(n_test, 2 * n_test)]}
    G_means, F_mean, F_var = model.predict({"expression": X_test}, vi)
    assert F_mean["expression"].shape == (2 * n_test, 3)
    assert np.isfinite(F_mean["expression"]).all()


def test_svgp_matmul_precision_knob(two_view_data):
    """The precision knob must thread through to a valid model; on CPU all
    precisions are f32, so results are identical (TPU numbers in
    experiments/out/svgp_precision_ab.json)."""
    import spatial_alignment_tpu as sat

    def build(prec):
        return sat.VariationalGPSA(
            two_view_data, m_X_per_view=6, m_G=6,
            n_latent_gps={"expression": None}, seed=0,
            svgp_matmul_precision=prec,
        )

    m_hi, m_fast = build("highest"), build("high")
    assert m_fast.spec.svgp_matmul_precision == "high"
    k = jax.random.PRNGKey(0)
    e_hi = float(core.negative_elbo(m_hi.spec, m_hi.params, m_hi.consts, m_hi._batch, k, 2))
    e_fast = float(core.negative_elbo(m_fast.spec, m_fast.params, m_fast.consts, m_fast._batch, k, 2))
    np.testing.assert_allclose(e_hi, e_fast, rtol=1e-6)


def test_svgp_variance_precision_knob(two_view_data):
    """The variance-term precision sub-knob threads through; "follow"
    (default) is bit-identical to the single-knob behavior, an explicit
    value produces a finite ELBO, and old checkpoint manifests without the
    field load with the default (TPU accuracy/throughput A/B:
    experiments/out/variance_precision_ab.json)."""
    import spatial_alignment_tpu as sat
    from spatial_alignment_tpu.models.spec import spec_from_dict, spec_to_dict

    def build(**kw):
        return sat.VariationalGPSA(
            two_view_data, m_X_per_view=6, m_G=6,
            n_latent_gps={"expression": None}, seed=0, **kw,
        )

    m_plain = build()
    m_follow = build(svgp_variance_precision="follow")
    m_bf16 = build(svgp_variance_precision="default")
    assert m_plain.spec.svgp_variance_precision == "follow"
    k = jax.random.PRNGKey(0)
    e = [
        float(core.negative_elbo(m.spec, m.params, m.consts, m._batch, k, 2))
        for m in (m_plain, m_follow, m_bf16)
    ]
    assert e[0] == e[1]  # follow == pre-knob behavior, bit-identical
    assert np.isfinite(e[2])
    d = spec_to_dict(m_bf16.spec)
    assert spec_from_dict(d) == m_bf16.spec
    d.pop("svgp_variance_precision")
    assert spec_from_dict(d).svgp_variance_precision == "follow"
    with pytest.raises(ValueError):
        build(svgp_variance_precision="bogus")


def test_svgp_variance_precision_auto_resolution(two_view_data):
    """"auto" (the default) resolves WITH the matmul gate: "default"
    (1-pass bf16 variance terms, measured +13-16% steps/s at m=200/N=4050
    with convergence-parity medians, variance_precision_ab.json) exactly
    where svgp_matmul_precision resolves to "high" (>= 2000 total points),
    "follow" below."""
    import spatial_alignment_tpu as sat
    from spatial_alignment_tpu.models.spec import build_spec

    m_small = sat.VariationalGPSA(
        two_view_data, m_X_per_view=6, m_G=6,
        n_latent_gps={"expression": None}, seed=0,
    )
    assert m_small.spec.svgp_variance_precision == "follow"

    big = {
        "expression": {
            "spatial_coords": np.zeros((2400, 2), np.float32),
            "outputs": np.zeros((2400, 3), np.float32),
            "n_samples_list": [1200, 1200],
        }
    }
    assert build_spec(big, m_X_per_view=6, m_G=6).svgp_variance_precision == "default"
    # an explicit matmul precision doesn't stop the variance gate — it keys
    # off the RESOLVED matmul value
    spec_hi = build_spec(
        big, m_X_per_view=6, m_G=6, svgp_matmul_precision="highest"
    )
    assert spec_hi.svgp_variance_precision == "follow"
    # explicit user choice always wins
    spec_explicit = build_spec(
        big, m_X_per_view=6, m_G=6, svgp_variance_precision="highest"
    )
    assert spec_explicit.svgp_variance_precision == "highest"


def test_svgp_matmul_precision_auto_resolution(two_view_data):
    """The "auto" default resolves by data size: exact f32 ("highest") below
    2000 total points, bf16 3-pass ("high") at or above (convergence-parity
    gate: experiments/out/precision_convergence_ab.json)."""
    import spatial_alignment_tpu as sat
    from spatial_alignment_tpu.models.spec import build_spec

    m_small = sat.VariationalGPSA(
        two_view_data, m_X_per_view=6, m_G=6,
        n_latent_gps={"expression": None}, seed=0,
    )
    assert m_small.spec.svgp_matmul_precision == "highest"

    big = {
        "expression": {
            "spatial_coords": np.zeros((2400, 2), np.float32),
            "outputs": np.zeros((2400, 3), np.float32),
            "n_samples_list": [1200, 1200],
        }
    }
    spec_big = build_spec(big, m_X_per_view=6, m_G=6)
    assert spec_big.svgp_matmul_precision == "high"
    # explicit user choice always wins
    spec_explicit = build_spec(
        big, m_X_per_view=6, m_G=6, svgp_matmul_precision="highest"
    )
    assert spec_explicit.svgp_matmul_precision == "highest"


def test_triangular_variational_same_initial_elbo(two_view_data):
    """Triangular mode initializes Omega_sqt as the exact Cholesky of the
    square mode's initial covariance, so the initial ELBO (same key, same
    noise shapes) must match the square parameterization to float tolerance."""
    kw = dict(m_X_per_view=8, m_G=8, n_latent_gps={"expression": None}, seed=0)
    m_sq = sat.VariationalGPSA(two_view_data, **kw)
    m_tri = sat.VariationalGPSA(two_view_data, triangular_variational=True, **kw)
    assert m_tri.spec.triangular_variational

    # the stored factor differs (free square vs tril) ...
    sq = np.asarray(m_sq.params["Omega_sqt_G"])
    tri = np.asarray(m_tri.params["Omega_sqt_G"])
    assert not np.allclose(sq, tri)
    np.testing.assert_allclose(tri, np.tril(tri))  # lower triangular
    # ... but the implied covariance is identical (+ the square mode's jitter)
    cov_sq = sq @ np.swapaxes(sq, -1, -2)
    diag_mean = np.maximum(1.0, np.trace(cov_sq, axis1=-2, axis2=-1) / sq.shape[-1])
    cov_sq = cov_sq + 1e-5 * diag_mean[..., None, None] * np.eye(sq.shape[-1])
    cov_tri = tri @ np.swapaxes(tri, -1, -2)
    np.testing.assert_allclose(cov_tri, cov_sq, rtol=1e-4, atol=1e-6)

    k = jax.random.PRNGKey(3)
    e_sq = float(core.negative_elbo(m_sq.spec, m_sq.params, m_sq.consts, m_sq._batch, k, 3))
    e_tri = float(core.negative_elbo(m_tri.spec, m_tri.params, m_tri.consts, m_tri._batch, k, 3))
    np.testing.assert_allclose(e_sq, e_tri, rtol=1e-4)


def test_triangular_variational_trains(two_view_data):
    """Training in triangular mode decreases the loss and keeps every factor
    finite (the KL's -log|det| barrier keeps diagonals off zero)."""
    m = _tiny_model(two_view_data, seed=0, triangular_variational=True)
    losses = m.fit(n_epochs=300, lr=1e-2, S=3)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    d = np.diagonal(np.asarray(m.params["Omega_sqt_G"]), axis1=-2, axis2=-1)
    assert np.all(np.abs(d) > 0)


def test_whitened_variational_elbo_equivalence(two_view_data):
    """Square-mode params converted to the whitened parameterization (w =
    L^-1 (delta - mu_z), A = L^-1 chol(Omega)) must give the SAME negative
    ELBO under the same key: identical q distribution => identical samples
    => identical likelihood, and kl_whitened(w, A) == kl_mvn_chol in
    u-space (the prior terms cancel)."""
    import scipy.linalg as sla
    from spatial_alignment_tpu.ops.linalg import (
        jittered_cholesky, factor_psd_cholesky,
    )
    from spatial_alignment_tpu.ops.kernels import get_kernel

    kw = dict(m_X_per_view=8, m_G=8, n_latent_gps={"expression": None}, seed=0)
    m = sat.VariationalGPSA(two_view_data, **kw)
    spec, params, consts, batch = m.spec, m.params, m.consts, m._batch
    hp = merge_hyperparams(params, consts)
    eps = spec.diagonal_offset
    kern_w = get_kernel(spec.kernel_warp)
    kern_d = get_kernel(spec.kernel_data)

    pw = jax.tree.map(lambda x: x, params)
    Xt = np.asarray(hp["Xtilde"])
    Lw = np.stack([
        np.asarray(jittered_cholesky(
            kern_w(jnp.asarray(Xt[v]), jnp.asarray(Xt[v]),
                   hp["warp_kernel_lengthscales"][v],
                   hp["warp_kernel_variances"][v]), eps))
        for v in range(spec.n_views)
    ])
    mu_z = np.einsum("vmd,vde->vme", Xt, np.asarray(hp["mean_slopes"])) + \
        np.asarray(hp["mean_intercepts"])[:, None]
    delta = np.asarray(hp["delta_G"])
    pw["delta_G"] = jnp.asarray(np.stack([
        sla.solve_triangular(Lw[v], delta[v] - mu_z[v], lower=True)
        for v in range(spec.n_views)
    ]).astype(np.float32))
    C = np.asarray(factor_psd_cholesky(hp["Omega_sqt_G"], eps))
    A = np.stack([[sla.solve_triangular(Lw[v], C[v, d], lower=True)
                   for d in range(spec.n_spatial_dims)]
                  for v in range(spec.n_views)])
    np.testing.assert_allclose(A, np.tril(A))  # L^-1 C stays triangular
    pw["Omega_sqt_G"] = jnp.asarray(A.astype(np.float32))

    Gt = jnp.asarray(hp["Gtilde"])
    L_F = np.asarray(jittered_cholesky(
        kern_d(Gt, Gt, hp["data_kernel_lengthscale"],
               hp["data_kernel_variance"]), eps))
    for mod in spec.modalities:
        dF = np.asarray(hp["delta_F"][mod.name])
        pw["delta_F"][mod.name] = jnp.asarray(
            sla.solve_triangular(L_F, dF, lower=True).astype(np.float32))
        CF = np.asarray(factor_psd_cholesky(hp["Omega_sqt_F"][mod.name], eps))
        pw["Omega_sqt_F"][mod.name] = jnp.asarray(np.stack([
            sla.solve_triangular(L_F, CF[l], lower=True)
            for l in range(CF.shape[0])
        ]).astype(np.float32))

    spec_w = spec.replace(whitened_variational=True)
    key = jax.random.PRNGKey(7)
    e_sq = float(core.negative_elbo(spec, params, consts, batch, key, 4))
    e_wh = float(core.negative_elbo(spec_w, pw, consts, batch, key, 4))
    np.testing.assert_allclose(e_sq, e_wh, rtol=1e-4)


def test_whitened_variational_trains_and_aligns(two_view_data):
    """A whitened model (posterior-=-prior init) trains: loss decreases and
    stays finite; deterministic predict returns finite aligned coords."""
    m = _tiny_model(two_view_data, seed=0, whitened_variational=True)
    # init invariants: zero whitened mean, identity factors
    assert np.allclose(np.asarray(m.params["delta_G"]), 0.0)
    Om = np.asarray(m.params["Omega_sqt_G"])
    np.testing.assert_allclose(Om, np.broadcast_to(np.eye(Om.shape[-1]), Om.shape))
    losses = m.fit(n_epochs=300, lr=1e-2, S=3)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    X = {"expression": np.asarray(two_view_data["expression"]["spatial_coords"])}
    G, F, Fv = m.predict(X)
    for a in (G["expression"], F["expression"], Fv["expression"]):
        assert np.isfinite(np.asarray(a)).all()


def test_fit_multistart_selects_best_tail_loss(two_view_data):
    """fit_multistart keeps the restart with the lowest tail-mean loss and
    leaves the model holding that restart's parameters."""
    m = _tiny_model(two_view_data, seed=0)
    losses = m.fit_multistart(
        n_epochs=120, n_restarts=3, tail=30, verbose=False, lr=1e-2, S=2,
        select="loss",
    )
    assert losses.shape == (120,)
    assert np.isfinite(losses).all()
    # winner's own trace: re-evaluating the ELBO at the kept params should be
    # in the same range as the winning tail (not a stale loser's params)
    e = m.neg_elbo(S=2)
    assert np.isfinite(e)
    assert e < losses[0]


def test_reinitialize_changes_params(two_view_data):
    m = _tiny_model(two_view_data, seed=0)
    before = np.asarray(m.params["Omega_sqt_G"]).copy()
    m.reinitialize(1)
    after = np.asarray(m.params["Omega_sqt_G"])
    assert not np.allclose(before, after)


def test_fit_reuses_compiled_loop_across_calls(two_view_data):
    """Repeated fit() calls with the same training config (and fit_multistart
    restarts in particular) must reuse the compiled train loop instead of
    retracing per call."""
    m = _tiny_model(two_view_data, seed=0)
    m.fit(20, S=2)
    loop1 = m._train_loop_cache["loop"]
    m.fit(20, S=2)
    assert m._train_loop_cache["loop"] is loop1
    m.fit_multistart(n_epochs=20, n_restarts=2, S=2, verbose=False)
    assert m._train_loop_cache["loop"] is loop1
    # a different config must rebuild
    m.fit(20, S=3)
    assert m._train_loop_cache["loop"] is not loop1


def test_fit_multistart_predictive_select(two_view_data):
    """select='predictive' trains restarts on a holdout split, scores them by
    held-out predictive likelihood, and retrains the winner on full data."""
    m = _tiny_model(two_view_data, seed=0)
    losses = m.fit_multistart(
        n_epochs=40, n_restarts=2, S=2, select="predictive", verbose=False
    )
    assert losses.shape == (40,) and np.isfinite(losses).all()
    # the final model holds full-data-trained params (fit ran on self)
    assert m._epoch == 40
    with np.testing.assert_raises(ValueError):
        m.fit_multistart(n_epochs=5, n_restarts=2, select="bogus")


def test_fit_multistart_consistency_select(two_view_data):
    """select='consistency' (the 'auto' default when data is available)
    trains every restart on the full data, scores each by cross-view k-NN
    expression disagreement in aligned coordinates, keeps the best, and with
    ensemble_top_k > 1 stashes the averaged aligned coords."""
    m = _tiny_model(two_view_data, seed=0)
    losses = m.fit_multistart(
        n_epochs=40, n_restarts=2, S=2, verbose=False, ensemble_top_k=2
    )
    assert losses.shape == (40,) and np.isfinite(losses).all()
    ens = m.ensemble_G_means_
    assert ens is not None and "expression" in ens
    n_total = sum(m.spec.modalities[0].n_samples)
    assert ens["expression"].shape == (n_total, 2)
    # the consistency score itself is finite and positive on the kept model
    data = m._init_args["data_dict"]
    vi, Ns, _, _ = m.create_view_idx_dict(data)
    G_means, _, _, _ = m.forward(
        {"expression": np.asarray(data["expression"]["spatial_coords"], np.float32)},
        vi, Ns,
    )
    score = m._alignment_consistency({k: np.asarray(v) for k, v in G_means.items()})
    assert np.isfinite(score) and score > 0
    # without ensembling the attribute resets to None
    m.fit_multistart(n_epochs=10, n_restarts=2, S=2, verbose=False)
    assert m.ensemble_G_means_ is None


def test_fit_multistart_adaptive_waves(two_view_data, capsys):
    """adaptive_waves trains vmapped waves and stops once the best
    consistency score stabilizes: with a huge rtol the second wave can never
    'improve', so exactly two waves (4 of the 6 allowed restarts) run."""
    m = _tiny_model(two_view_data, seed=0)
    losses = m.fit_multistart(
        n_epochs=40, n_restarts=6, S=2, adaptive_waves=2,
        adaptive_rtol=0.99, select="consistency", verbose=True,
    )
    out = capsys.readouterr().out
    n_scored = out.count(": consistency ")
    assert "stabilized" in out
    assert n_scored == 4, out
    assert losses.shape == (40,) and np.isfinite(losses).all()
    assert np.isfinite(m.neg_elbo(S=2))
    # rtol <= 0 never sees an 'improvement' smaller than the bar, so every
    # wave runs to the cap (and the cap is not exceeded).
    m2 = _tiny_model(two_view_data, seed=0)
    m2.fit_multistart(
        n_epochs=40, n_restarts=3, S=2, adaptive_waves=2,
        adaptive_rtol=-1e9, select="consistency", verbose=True,
    )
    out2 = capsys.readouterr().out
    assert out2.count(": consistency ") == 3  # waves of 2 + 1, capped
    # invalid combinations fail loudly
    with np.testing.assert_raises(ValueError):
        m.fit_multistart(n_epochs=5, n_restarts=4, adaptive_waves=2,
                         select="loss")
    with np.testing.assert_raises(RuntimeError):
        m.fit_multistart(n_epochs=5, n_restarts=4, adaptive_waves=2,
                         select="consistency", vectorized=False)


def test_alignment_consistency_subsample(two_view_data):
    """The >max_points subsample is fixed-seed (identical across calls, so
    restart scores stay comparable) and still produces a finite score."""
    m = _tiny_model(two_view_data, seed=0)
    m.fit(20, S=2)
    data = m._init_args["data_dict"]
    vi, Ns, _, _ = m.create_view_idx_dict(data)
    G_means, _, _, _ = m.forward(
        {"expression": np.asarray(
            data["expression"]["spatial_coords"], np.float32)},
        vi, Ns,
    )
    G_np = {k: np.asarray(v) for k, v in G_means.items()}
    s_full = m._alignment_consistency(G_np)
    s_sub1 = m._alignment_consistency(G_np, max_points=10)
    s_sub2 = m._alignment_consistency(G_np, max_points=10)
    assert np.isfinite(s_full) and np.isfinite(s_sub1)
    assert s_sub1 == s_sub2  # fixed-seed subsample: deterministic
    assert s_sub1 != s_full  # and it really did subsample


def test_holdout_split_respects_template(two_view_data):
    m = _tiny_model(two_view_data, seed=0, fixed_view_idx=0)
    rng = np.random.default_rng(0)
    train, holdout = m._holdout_split(0.2, rng)
    counts = train["expression"]["n_samples_list"]
    h_counts = holdout["expression"]["counts"]
    orig = two_view_data["expression"]["n_samples_list"]
    assert counts[0] == orig[0] and h_counts[0] == 0  # template untouched
    assert counts[1] == orig[1] - h_counts[1] and h_counts[1] == round(0.2 * orig[1])
    # holdout points are real points from the source view
    X = two_view_data["expression"]["spatial_coords"]
    v1 = X[orig[0]:]
    for x in holdout["expression"]["X"]:
        assert (np.abs(v1 - x).sum(1) < 1e-6).any()


def test_fit_recipe_reuses_compiled_loop(two_view_data):
    """fit(recipe="accurate") resolves the recipe to a memoized optimizer, so
    back-to-back recipe fits with the same (lr, n_epochs) hit the loop cache
    instead of recompiling (ADVICE r2)."""
    m = _tiny_model(two_view_data, seed=0)
    m.fit(20, S=2, recipe="accurate")
    loop1 = m._train_loop_cache["loop"]
    m.fit(20, S=2, recipe="accurate")
    assert m._train_loop_cache["loop"] is loop1
    # a different epoch count means a different decay schedule -> new loop
    m.fit(30, S=2, recipe="accurate")
    assert m._train_loop_cache["loop"] is not loop1


def test_fit_loop_cache_invalidated_when_state_replaced(two_view_data):
    """Replacing consts/batch (load(), parallel.distribute()) must invalidate
    the cached train loop — a stale closure would train against old state."""
    m = _tiny_model(two_view_data, seed=0)
    m.fit(10, S=2)
    loop1 = m._train_loop_cache["loop"]
    m.consts = dict(m.consts)  # new object, as load()/distribute() produce
    m.fit(10, S=2)
    assert m._train_loop_cache["loop"] is not loop1
    loop2 = m._train_loop_cache["loop"]
    m._batch = dict(m._batch)
    m.fit(10, S=2)
    assert m._train_loop_cache["loop"] is not loop2


def test_fit_multistart_vectorized_vs_sequential(two_view_data):
    """The vmapped restart axis (vectorized='auto'/True) trains all restarts
    in one scanned loop; the sequential path must remain available and both
    must produce finite, decreasing traces and a winning model."""
    m = _tiny_model(two_view_data, seed=0)
    lv = m.fit_multistart(
        n_epochs=60, n_restarts=3, S=2, verbose=False, vectorized=True
    )
    assert lv.shape == (60,) and np.isfinite(lv).all()
    assert lv[-1] < lv[0]
    e_vec = float(m.neg_elbo(S=2))

    m2 = _tiny_model(two_view_data, seed=0)
    ls = m2.fit_multistart(
        n_epochs=60, n_restarts=3, S=2, verbose=False, vectorized=False
    )
    assert ls.shape == (60,) and np.isfinite(ls).all()
    e_seq = float(m2.neg_elbo(S=2))
    # Different RNG streams, same distributional behavior: both converge to
    # the same loss scale (order of magnitude, not bit parity).
    assert np.isfinite(e_vec) and np.isfinite(e_seq)
    assert abs(np.log10(max(e_vec, 1e-9) / max(e_seq, 1e-9))) < 1.0

    # vectorized=True must refuse configurations the batched loop can't run
    with np.testing.assert_raises(RuntimeError):
        m.fit_multistart(
            n_epochs=5, n_restarts=2, verbose=False, vectorized=True,
            average_last=3,
        )
    with np.testing.assert_raises(ValueError):
        m.fit_multistart(
            n_epochs=5, n_restarts=2, verbose=False, vectorized="sometimes"
        )


def test_fit_multistart_wave_size(two_view_data):
    """wave_size chunks the vectorized path into fixed-width waves (all
    waves run, bounding compiled-program width); a partial final wave
    trains surplus restarts and discards them; the jitted wave loop is
    memoized across waves."""
    m = _tiny_model(two_view_data, seed=0)
    lv = m.fit_multistart(
        n_epochs=40, n_restarts=5, S=2, verbose=False, vectorized=True,
        wave_size=2,
    )
    assert lv.shape == (40,) and np.isfinite(lv).all()
    assert float(m.neg_elbo(S=2)) and m._vec_loop_cache["key"][0] == 2

    # mixed init composes with waves (transforms sliced per wave + padded)
    m2 = _tiny_model(two_view_data, fixed_view_idx=0, seed=0)
    lv2 = m2.fit_multistart(
        n_epochs=40, n_restarts=4, S=2, verbose=False, vectorized=True,
        wave_size=3, init="mixed",
    )
    assert np.isfinite(lv2).all()

    with np.testing.assert_raises(ValueError):
        m.fit_multistart(
            n_epochs=5, n_restarts=4, verbose=False, wave_size=2,
            adaptive_waves=2,
        )
    with np.testing.assert_raises(ValueError):
        m.fit_multistart(n_epochs=5, n_restarts=4, verbose=False, wave_size=0)


def test_warp_init_transforms_recover_affine(two_view_data):
    """On a view that is an exact affine map of the template, both init
    families recover a transform that undoes it (VERDICT r4 item 2)."""
    X = np.asarray(two_view_data["expression"]["spatial_coords"]).copy()
    Y = np.asarray(two_view_data["expression"]["outputs"]).copy()
    theta = 0.5
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    X[30:] = X[:30] @ R.T + np.array([1.5, -0.5])
    Y[30:] = Y[:30]
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": [30, 30]}}
    m = _tiny_model(dd, fixed_view_idx=0, seed=0)
    for method in ("prealign", "ot"):
        t = m._warp_init_transforms(method)
        assert t[0] is None  # anchor view untouched
        A_T, b = t[1]
        mapped = X[30:] @ A_T + b
        err = float(np.mean(np.sum((mapped - X[:30]) ** 2, axis=1)))
        pre = float(np.mean(np.sum((X[30:] - X[:30]) ** 2, axis=1)))
        assert err < 0.05 * pre, (method, err, pre)


def test_apply_warp_seed_sets_delta(two_view_data):
    m = _tiny_model(two_view_data, seed=0)
    A_T = 2.0 * np.eye(2)
    b = np.array([1.0, -1.0])
    p = m._apply_warp_seed(m.params, [None, (A_T, b)])
    Xt = np.asarray(m.params["Xtilde"])
    np.testing.assert_allclose(np.asarray(p["delta_G"])[0], Xt[0])
    np.testing.assert_allclose(
        np.asarray(p["delta_G"])[1], Xt[1] @ A_T + b, rtol=1e-6
    )
    # original params untouched
    np.testing.assert_allclose(np.asarray(m.params["delta_G"]), Xt)


def test_fit_multistart_init_families(two_view_data):
    """init='mixed' cycles {random, prealign, ot} restarts through the
    vectorized path and still selects a finite winner."""
    m = _tiny_model(two_view_data, fixed_view_idx=0, seed=0)
    losses = m.fit_multistart(
        n_epochs=40, n_restarts=3, S=2, verbose=False, init="mixed"
    )
    assert losses.shape == (40,) and np.isfinite(losses).all()
    G, _, _ = m.predict(
        {"expression": np.asarray(two_view_data["expression"]["spatial_coords"])}
    )
    assert np.isfinite(np.asarray(G["expression"])).all()
    with pytest.raises(ValueError):
        m.fit_multistart(n_epochs=5, n_restarts=2, init="bogus")


def test_fit_multistart_winner_metadata(two_view_data):
    """fit_multistart records the winning restart's index and init family
    (multistart_winner_) under both selection criteria."""
    m = _tiny_model(two_view_data, fixed_view_idx=0, seed=0)
    m.fit_multistart(n_epochs=30, n_restarts=3, S=2, verbose=False,
                     init="mixed")
    w = m.multistart_winner_
    assert w is not None
    assert 0 <= w["restart"] < 3
    assert w["init_family"] == ["random", "prealign", "ot"][w["restart"]]
    assert np.isfinite(w["consistency"])

    m2 = _tiny_model(two_view_data, fixed_view_idx=0, seed=0)
    m2.fit_multistart(n_epochs=30, n_restarts=2, S=2, verbose=False,
                      select="loss")
    w2 = m2.multistart_winner_
    assert w2 is not None and w2["init_family"] == "random"
    assert np.isfinite(w2["tail_loss"])


def test_fit_multistart_init_sequential_path(two_view_data):
    """Affine-seeded inits also apply on the sequential (non-vectorized)
    restart path."""
    m = _tiny_model(two_view_data, fixed_view_idx=0, seed=0)
    losses = m.fit_multistart(
        n_epochs=30, n_restarts=2, S=2, verbose=False, init="prealign",
        vectorized=False, select="loss",
    )
    assert np.isfinite(losses).all()


def test_fit_multistart_init_whitened_raises(two_view_data):
    m = _tiny_model(two_view_data, seed=0, whitened_variational=True)
    with pytest.raises(ValueError):
        m.fit_multistart(n_epochs=5, n_restarts=2, init="prealign")
