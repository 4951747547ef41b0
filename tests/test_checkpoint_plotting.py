"""Checkpoint round-trip and plotting-callback smoke tests."""

import os

import numpy as np
import jax
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pytest

import spatial_alignment_tpu as sat
from spatial_alignment_tpu.models import core
from spatial_alignment_tpu.plotting import (
    callback_oned,
    callback_twod,
    callback_twod_aligned_only,
    callback_twod_multimodal,
)

from conftest import make_two_view_data


def _model(data, **kw):
    kw.setdefault("m_X_per_view", 6)
    kw.setdefault("m_G", 6)
    kw.setdefault("n_latent_gps", {m: None for m in data})
    return sat.VariationalGPSA(data, **kw)


def test_checkpoint_roundtrip(tmp_path, two_view_data):
    model = _model(two_view_data, fixed_warp_kernel_variances=[0.5, 0.5])
    model.fit(5, S=2)
    path = str(tmp_path / "ckpt.npz")
    model.save(path, step=5)
    assert os.path.exists(path) and os.path.exists(path + ".json")

    model2 = _model(two_view_data, fixed_warp_kernel_variances=[0.5, 0.5], seed=99)
    # different init -> different elbo; after load, elbo matches with same key
    key = jax.random.PRNGKey(0)
    e1 = float(core.negative_elbo(model.spec, model.params, model.consts, model._batch, key, 2))
    model2.load(path)
    e2 = float(core.negative_elbo(model2.spec, model2.params, model2.consts, model2._batch, key, 2))
    np.testing.assert_allclose(e1, e2, rtol=1e-6)


def test_selfcontained_load_no_constructor_args(tmp_path, two_view_data):
    """VariationalGPSA.load(path) rebuilds a working model from the
    checkpoint alone: spec, params, consts and training data all embedded."""
    model = _model(two_view_data, fixed_view_idx=0, triangular_variational=True)
    model.fit(10, S=2)
    path = str(tmp_path / "self.npz")
    model.save(path)

    m2 = sat.VariationalGPSA.load(path)
    assert m2.spec == model.spec
    assert m2.fixed_view_idx == 0
    key = jax.random.PRNGKey(3)
    e1 = float(core.negative_elbo(model.spec, model.params, model.consts, model._batch, key, 2))
    e2 = float(core.negative_elbo(m2.spec, m2.params, m2.consts, m2._batch, key, 2))
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    # the rebuilt model can keep training and predicting
    losses = m2.fit(5, S=2)
    assert np.isfinite(losses).all()
    X = two_view_data["expression"]["spatial_coords"]
    G, F, V = m2.predict({"expression": X})
    assert np.isfinite(np.asarray(G["expression"])).all()
    # reinitialize needs the original data -> informative error
    with pytest.raises(RuntimeError, match="reinitialize"):
        m2.reinitialize(1)


def test_load_without_spec_raises(tmp_path, two_view_data):
    from spatial_alignment_tpu.utils.checkpoint import save_checkpoint

    model = _model(two_view_data)
    path = str(tmp_path / "old.npz")
    save_checkpoint(path, model.params, model.consts)  # pre-round-3 format
    with pytest.raises(ValueError, match="self-contained"):
        sat.VariationalGPSA.load(path)
    # instance-method restore still works on the old format
    model.load(path)


def test_kill_and_resume_matches_uninterrupted(tmp_path, two_view_data):
    """fit(60) == fit(30) + save + load-in-fresh-model + fit(30, resume):
    same params to float tolerance — Adam moments and the RNG carry key
    survive the checkpoint (VERDICT r2 item 7)."""
    import optax

    tx = optax.adam(1e-2)
    ref = _model(two_view_data, seed=7)
    ref.fit(60, S=2, optimizer=tx)

    m = _model(two_view_data, seed=7)
    m.fit(30, S=2, optimizer=tx)
    path = str(tmp_path / "mid.npz")
    m.save(path)

    m2 = sat.VariationalGPSA.load(path)
    m2.fit(30, S=2, optimizer=tx, resume_from=path)
    assert m2._epoch == 60

    ra, _ = jax.tree_util.tree_flatten_with_path(ref.params)
    rb = jax.tree.leaves(m2.params)
    assert len(ra) == len(rb)
    for (path, a), b in zip(ra, rb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_attach_data_reenables_training(tmp_path, two_view_data):
    """A model loaded from an include_data=False checkpoint can't fit —
    until attach_data re-supplies the original data (validated against
    the spec), after which fit/neg_elbo/reinitialize work again."""
    model = _model(two_view_data, fixed_view_idx=0)
    model.fit(10, S=2)
    path = str(tmp_path / "nodata.npz")
    model.save(path, include_data=False)

    m2 = sat.VariationalGPSA.load(path)
    with pytest.raises(RuntimeError, match="attach_data"):
        m2.fit(5, S=2)
    with pytest.raises(RuntimeError, match="attach_data"):
        m2.reinitialize(7)

    # wrong per-view counts are rejected before packing
    bad = {
        k: {**v, "n_samples_list": [int(v["n_samples_list"][0]) + 1,
                                    int(v["n_samples_list"][1]) - 1]}
        for k, v in two_view_data.items()
    }
    with pytest.raises(ValueError, match="n_samples_list"):
        m2.attach_data(bad)

    m2.attach_data(two_view_data)
    key = jax.random.PRNGKey(0)
    e1 = float(core.negative_elbo(
        model.spec, model.params, model.consts, model._batch, key, 2))
    e2 = float(core.negative_elbo(
        m2.spec, m2.params, m2.consts, m2._batch, key, 2))
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    losses = m2.fit(5, S=2)
    assert np.all(np.isfinite(np.asarray(losses)))
    m2.reinitialize(7)  # _init_args restored


def test_attach_data_fixed_kernel_guard(tmp_path, two_view_data):
    """Specs with fixed kernel hyperparameters need the original fixed
    values re-supplied (they live in consts, not the spec)."""
    model = _model(two_view_data, fixed_warp_kernel_variances=[0.5, 0.5])
    model.fit(5, S=2)
    path = str(tmp_path / "fixed.npz")
    model.save(path, include_data=False)
    m2 = sat.VariationalGPSA.load(path)
    with pytest.raises(ValueError, match="fixed_warp_kernel_variances"):
        m2.attach_data(two_view_data)
    m2.attach_data(
        two_view_data, fixed_warp_kernel_variances=[0.5, 0.5]
    )
    losses = m2.fit(5, S=2)
    assert np.all(np.isfinite(np.asarray(losses)))
    m2.reinitialize(3)


def test_checkpoint_shape_mismatch_raises(tmp_path, two_view_data):
    model = _model(two_view_data)
    path = str(tmp_path / "ckpt.npz")
    model.save(path)
    other = _model(two_view_data, m_X_per_view=8, m_G=8)
    with pytest.raises(ValueError, match="shape"):
        other.load(path)


def test_callback_twod_smoke(two_view_data):
    model = _model(two_view_data, fixed_view_idx=0)
    X = two_view_data["expression"]["spatial_coords"]
    Y = two_view_data["expression"]["outputs"]
    G_means, _, _, _ = model.forward({"expression": X}, S=1)
    fig, (ax1, ax2) = plt.subplots(1, 2)
    callback_twod(model, X, Y, X_aligned={"expression": G_means["expression"]},
                  data_expression_ax=ax1, latent_expression_ax=ax2)
    callback_twod_aligned_only(model, X, Y,
                               X_aligned={"expression": G_means["expression"]},
                               latent_expression_ax1=ax1, latent_expression_ax2=ax2)
    plt.close(fig)


def test_callback_oned_smoke():
    data = {
        "expression": {
            "spatial_coords": np.linspace(-5, 5, 40).reshape(-1, 1).astype(np.float32),
            "outputs": np.random.default_rng(0).standard_normal((40, 2)).astype(np.float32),
            "n_samples_list": [20, 20],
        }
    }
    model = _model(data)
    X = data["expression"]["spatial_coords"]
    G_means, _, _, _ = model.forward({"expression": X}, S=1)
    fig, (ax1, ax2) = plt.subplots(1, 2)
    callback_oned(model, X, data["expression"]["outputs"],
                  X_aligned={"expression": G_means["expression"]},
                  data_expression_ax=ax1, latent_expression_ax=ax2)
    plt.close(fig)


def test_callback_multimodal_smoke():
    data = make_two_view_data(n_per_view=15, n_outputs=3)
    data["histology"] = make_two_view_data(n_per_view=10, n_outputs=3, seed=4)["expression"]
    model = _model(data, n_noise_variance_params=3)
    X = {m: data[m]["spatial_coords"] for m in data}
    G_means, _, _, _ = model.forward(X, S=1)
    fig, axes = plt.subplots(2, 2)
    callback_twod_multimodal(model, data, {m: G_means[m] for m in data}, axes.ravel())
    plt.close(fig)


def test_resume_with_recipe_matches_uninterrupted(tmp_path, two_view_data):
    """fit(recipe=..., resume_from=...) must continue the SAME cosine
    schedule an uninterrupted fit of the total length runs — the schedule
    horizon is total epochs (checkpointed step + n_epochs), and the restored
    optimizer count places the continuation on the right segment. A
    fresh-horizon schedule would pin the whole continuation at the decay
    floor (review finding, round 3)."""
    from spatial_alignment_tpu.models.vgpsa import _resolve_recipe

    m1 = _model(two_view_data, seed=0)
    l_full = m1.fit(40, S=2, recipe="accurate")

    # First segment: explicitly run the recipe's TOTAL-horizon (40-epoch)
    # optimizer/schedule for 20 epochs, as an interrupted 40-epoch run
    # would have.
    opt40, temps40 = _resolve_recipe("accurate", 1e-2, 40, None, None)
    m2 = _model(two_view_data, seed=0)
    m2.fit(20, S=2, optimizer=opt40, warp_temperature_schedule=temps40)
    p = str(tmp_path / "mid.npz")
    m2.save(p)
    # Continuation via the recipe: horizon resolves to step(20) + 20 = 40,
    # so the schedule and its count line up with the uninterrupted run.
    m3 = _model(two_view_data, seed=0)
    l_resumed = m3.fit(20, S=2, recipe="accurate", resume_from=p)
    assert np.isfinite(l_resumed).all()
    for a, b in zip(jax.tree.leaves(m3.params), jax.tree.leaves(m1.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(l_resumed, l_full[20:], rtol=1e-5, atol=1e-4)


def test_multistart_winner_checkpoint_refuses_exact_resume(
    tmp_path, two_view_data
):
    """After fit_multistart the stashed Adam moments belong to a different
    restart than the winning params, so save() must write no optimizer
    state and resume must fail loudly instead of silently mis-resuming."""
    m = _model(two_view_data, seed=0)
    m.fit_multistart(n_epochs=10, n_restarts=2, S=2, verbose=False)
    p = str(tmp_path / "winner.npz")
    m.save(p)
    m2 = _model(two_view_data, seed=0)
    with pytest.raises(ValueError, match="no optimizer state"):
        m2.fit(5, S=2, resume_from=p)


def test_average_last_checkpoint_refuses_exact_resume(tmp_path, two_view_data):
    """Polyak-averaged params are not a trajectory endpoint; pairing them
    with end-of-trajectory Adam moments would silently mis-resume."""
    m = _model(two_view_data, seed=0)
    m.fit(20, S=2, average_last=10)
    p = str(tmp_path / "avg.npz")
    m.save(p)
    m2 = _model(two_view_data, seed=0)
    with pytest.raises(ValueError, match="no optimizer state"):
        m2.fit(5, S=2, resume_from=p)


def test_resume_keeps_consts_object_when_values_match(tmp_path, two_view_data):
    """fit(resume_from=...) restores consts BEFORE building the train loop
    (so the loop closure can't capture stale values) and keeps the existing
    consts object when values match, preserving the compiled-loop cache."""
    m = _model(two_view_data, seed=0)
    m.fit(10, S=2)
    p = str(tmp_path / "c.npz")
    m.save(p)
    consts_before = m.consts
    loop_before = m._train_loop_cache["loop"]
    m.fit(5, S=2, resume_from=p)
    assert m.consts is consts_before
    assert m._train_loop_cache["loop"] is loop_before
