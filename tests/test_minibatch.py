"""Minibatch SVI tests: the subsampled ELBO is an unbiased estimator of the
full-batch objective, the weighting is exact in the degenerate case, and
minibatch training converges (SURVEY.md §4 tiers 1-3). The reference trains
full-batch only (vgpsa.py:491-540); this is a beyond-reference scaling path."""

import numpy as np
import jax
import pytest

import spatial_alignment_tpu as sat
from spatial_alignment_tpu.models import core

from conftest import make_two_view_data


def _model(data, **kw):
    kw.setdefault("m_X_per_view", 8)
    kw.setdefault("m_G", 8)
    kw.setdefault("n_latent_gps", {m: None for m in data})
    return sat.VariationalGPSA(data, **kw)


def test_minibatch_spec_shapes(two_view_data):
    model = _model(two_view_data)
    sub_spec = core.minibatch_spec(model.spec, 7)
    for m in sub_spec.modalities:
        assert m.n_padded == 7
        assert m.n_samples == (7,) * sub_spec.n_views
    # original untouched
    assert model.spec.modalities[0].n_padded == 30


def test_subsample_batch_gathers_real_points(two_view_data):
    """Every gathered point must be one of the view's true points, and the
    mask must carry the N_v/B importance weight."""
    model = _model(two_view_data)
    B = 11
    sub_spec = core.minibatch_spec(model.spec, B)
    sub = core.subsample_batch(
        model.spec, sub_spec, model._batch, jax.random.PRNGKey(3)
    )
    coords = np.asarray(sub["expression"]["coords"])  # (V, B, D)
    full = np.asarray(model._batch["expression"]["coords"])  # (V, Np, D)
    for v in range(model.spec.n_views):
        n_v = model.spec.modalities[0].n_samples[v]
        real = full[v, :n_v]
        for b in range(B):
            d = np.abs(real - coords[v, b]).sum(axis=1).min()
            assert d == 0.0
    mask = np.asarray(sub["expression"]["mask"])
    np.testing.assert_allclose(mask, 30.0 / B)


def test_minibatch_elbo_unbiased(two_view_data):
    """E[minibatch loss] over index draws equals the full-batch loss.

    Deterministic setting (temperature 0 = posterior-mean warp; analytic
    data-layer likelihood = no F sampling) so the only randomness is the
    point subsample, in which the likelihood is linear."""
    model = _model(two_view_data, analytic_data_likelihood=True)
    spec, params, consts, batch = model.spec, model.params, model.consts, model._batch
    key = jax.random.PRNGKey(0)
    full = float(core.negative_elbo(spec, params, consts, batch, key, 1, 0.0))

    B = 15
    sub_spec = core.minibatch_spec(spec, B)

    @jax.jit
    def mb_loss(k):
        return core.negative_elbo_minibatch(
            spec, sub_spec, params, consts, batch, k, 1, 0.0
        )

    n_draws = 400
    vals = np.array(
        [float(mb_loss(jax.random.PRNGKey(i))) for i in range(n_draws)]
    )
    stderr = vals.std(ddof=1) / np.sqrt(n_draws)
    assert abs(vals.mean() - full) < 4.0 * stderr + 1e-6 * abs(full)


def test_minibatch_exact_when_single_point_views():
    """With one true point per view every draw hits that point; B copies at
    weight 1/B must reproduce the full-batch loss exactly."""
    data = make_two_view_data(n_per_view=1, n_outputs=2)
    model = _model(data, m_X_per_view=1, m_G=2, analytic_data_likelihood=True)
    spec, params, consts, batch = model.spec, model.params, model.consts, model._batch
    key = jax.random.PRNGKey(5)
    full = float(core.negative_elbo(spec, params, consts, batch, key, 1, 0.0))
    sub_spec = core.minibatch_spec(spec, 4)
    mb = float(
        core.negative_elbo_minibatch(
            spec, sub_spec, params, consts, batch, key, 1, 0.0
        )
    )
    np.testing.assert_allclose(mb, full, rtol=1e-5)


def test_minibatch_training_converges():
    """fit(minibatch_size=B) recovers a GP warp like full-batch training does
    (config and tolerance mirror tests/test_integration_alignment.py; the
    stochastic gradient needs ~2x the epochs of full batch)."""
    from spatial_alignment_tpu.data import generate_twod_data

    rng = np.random.default_rng(0)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 10, grid_size=8, n_latent_gps=None,
        kernel_variance=0.1, kernel_lengthscale=5.0, noise_variance=1e-3,
        fixed_view_idx=0, rng=rng,
    )
    dd = {
        "expression": {
            "spatial_coords": X.astype(np.float32),
            "outputs": Y.astype(np.float32),
            "n_samples_list": nsl,
        }
    }
    model = sat.VariationalGPSA(
        dd, m_X_per_view=16, m_G=16, n_latent_gps={"expression": None}, seed=0
    )
    losses = model.fit(1600, lr=1e-2, S=3, minibatch_size=32)
    assert np.isfinite(losses).all()
    G, _, _, _ = model.forward({"expression": X.astype(np.float32)})
    err = lambda c: float(
        np.mean(np.sum((c[view_idx[0]] - c[view_idx[1]]) ** 2, axis=1))
    )
    pre, post = err(X), err(G["expression"])
    assert post < pre / 3, (pre, post)


def test_minibatch_loop_matches_step(two_view_data):
    """make_train_step and make_train_loop agree on the minibatch path (same
    RNG chain, same parameter trajectory)."""
    model = _model(two_view_data)
    step, opt_state = model.make_train_step(lr=1e-2, S=2, minibatch_size=10)
    loop, opt_state2 = model.make_train_loop(lr=1e-2, S=2, minibatch_size=10)

    key = jax.random.PRNGKey(7)
    params = model.params
    # loop semantics: key is split per step; replicate manually for the step fn
    k = key
    for _ in range(3):
        k, sub = jax.random.split(k)
        params, opt_state, loss = step(params, opt_state, sub)
    carry, losses = loop((model.params, opt_state2, key), 3)
    leaves_a = jax.tree.leaves(params)
    leaves_b = jax.tree.leaves(carry[0])
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_minibatch_composes_with_recipe_options(two_view_data):
    """minibatch + accurate recipe + tail averaging + print_every all work
    together through one fit() call."""
    model = _model(two_view_data)
    losses = model.fit(
        120, S=2, minibatch_size=16, recipe="accurate",
        average_last=40, print_every=60,
    )
    assert losses.shape == (120,)
    assert np.isfinite(losses).all()


def test_fit_rejects_unknown_recipe(two_view_data):
    model = _model(two_view_data)
    with pytest.raises(ValueError):
        model.fit(10, recipe="bogus")


def test_minibatch_size_must_be_positive(two_view_data):
    model = _model(two_view_data)
    with pytest.raises(ValueError):
        model.fit(10, minibatch_size=0)
    with pytest.raises(ValueError):
        core.minibatch_spec(model.spec, 0)


def test_subsample_uneven_view_sizes():
    """Views with different true counts get per-view N_v/B weights and only
    sample their own real points."""
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 10, (32, 2)).astype(np.float32)
    Y = rng.standard_normal((32, 3)).astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                          "n_samples_list": [20, 12]}}
    model = _model(dd, m_X_per_view=4, m_G=4)
    B = 9
    sub_spec = core.minibatch_spec(model.spec, B)
    sub = core.subsample_batch(model.spec, sub_spec, model._batch, jax.random.PRNGKey(1))
    mask = np.asarray(sub["expression"]["mask"])
    np.testing.assert_allclose(mask[0], 20.0 / B)
    np.testing.assert_allclose(mask[1], 12.0 / B)
    coords = np.asarray(sub["expression"]["coords"])
    full = np.asarray(model._batch["expression"]["coords"])
    for v, n_v in enumerate([20, 12]):
        real = full[v, :n_v]
        for b in range(B):
            assert np.abs(real - coords[v, b]).sum(axis=1).min() == 0.0
