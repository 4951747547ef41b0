"""Multi-chip tests on the 8-virtual-CPU-device mesh (SURVEY.md §4 tier 4):
sharded ELBO/gradients must match single-device to tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spatial_alignment_tpu as sat
from spatial_alignment_tpu.models import core
from spatial_alignment_tpu.parallel import make_mesh, distribute

from conftest import make_two_view_data


def _model(data, **kw):
    kw.setdefault("m_X_per_view", 6)
    kw.setdefault("m_G", 6)
    kw.setdefault("n_latent_gps", {m: None for m in data})
    kw.setdefault("seed", 0)
    return sat.VariationalGPSA(data, **kw)


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_elbo_matches_single_device():
    data = make_two_view_data(n_per_view=24, n_outputs=4)
    m_single = _model(data)
    m_shard = _model(data, pad_multiple=4)
    mesh = make_mesh(4)
    distribute(m_shard, mesh)
    key = jax.random.PRNGKey(3)
    # padding differs (24 vs 24: both pad to 24) -> same shapes, same RNG draws
    assert m_shard.spec.modality("expression").n_padded == 24
    e1 = float(core.negative_elbo(m_single.spec, m_single.params, m_single.consts, m_single._batch, key, 3))
    e2 = float(core.negative_elbo(m_shard.spec, m_shard.params, m_shard.consts, m_shard._batch, key, 3))
    np.testing.assert_allclose(e1, e2, rtol=2e-4)


def test_sharded_grads_match_single_device():
    data = make_two_view_data(n_per_view=16, n_outputs=4)
    m_single = _model(data)
    m_shard = _model(data, pad_multiple=8)
    assert m_shard.spec.modality("expression").n_padded == 16
    mesh = make_mesh(8)
    distribute(m_shard, mesh)
    key = jax.random.PRNGKey(5)

    def g(m):
        return jax.grad(
            lambda p: core.negative_elbo(m.spec, p, m.consts, m._batch, key, 2)
        )(m.params)

    g1, g2 = g(m_single), g(m_shard)
    flat1, _ = jax.tree.flatten(g1)
    flat2, _ = jax.tree.flatten(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_model_axis_sharding_lmc():
    """2-D mesh: points over data axis, latent GPs over model axis."""
    data = make_two_view_data(n_per_view=16, n_outputs=6)
    m_shard = _model(data, n_latent_gps={"expression": 4}, pad_multiple=4)
    m_single = _model(data, n_latent_gps={"expression": 4})
    mesh = make_mesh(8, model_parallel=2)
    distribute(m_shard, mesh)
    key = jax.random.PRNGKey(1)
    e1 = float(core.negative_elbo(m_single.spec, m_single.params, m_single.consts, m_single._batch, key, 2))
    e2 = float(core.negative_elbo(m_shard.spec, m_shard.params, m_shard.consts, m_shard._batch, key, 2))
    np.testing.assert_allclose(e1, e2, rtol=2e-4)


def test_sharded_training_step_runs_and_matches():
    data = make_two_view_data(n_per_view=16, n_outputs=3)
    m_shard = _model(data, pad_multiple=8)
    m_single = _model(data)
    distribute(m_shard, make_mesh(8))
    step_s, opt_s = m_single.make_train_step(lr=1e-2, S=2)
    step_d, opt_d = m_shard.make_train_step(lr=1e-2, S=2)
    key = jax.random.PRNGKey(9)
    p1, _, l1 = step_s(m_single.params, opt_s, key)
    p2, _, l2 = step_d(m_shard.params, opt_d, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_pad_multiple_mismatch_raises():
    data = make_two_view_data(n_per_view=30)
    m = _model(data)  # n_padded = 30, not divisible by 4
    with pytest.raises(ValueError, match="pad_multiple"):
        distribute(m, make_mesh(4))


def test_shardmap_elbo_bit_identical_to_single_device():
    """The explicit-collective shard_map executor must reproduce the
    single-device ELBO exactly (same keys, full-noise-then-slice design)."""
    from spatial_alignment_tpu.parallel import make_shardmap_neg_elbo

    data = make_two_view_data(n_per_view=24, n_outputs=4)
    model = _model(data, pad_multiple=4, n_latent_gps={"expression": 2})
    mesh = make_mesh(4)
    key = jax.random.PRNGKey(11)
    neg_elbo = make_shardmap_neg_elbo(model.spec, mesh, model.consts, S=3)
    e_shard = float(neg_elbo(model.params, model._batch, key))
    e_single = float(
        core.negative_elbo(model.spec, model.params, model.consts, model._batch, key, 3)
    )
    np.testing.assert_allclose(e_shard, e_single, rtol=1e-5)


def test_shardmap_grads_match_single_device():
    from spatial_alignment_tpu.parallel import make_shardmap_neg_elbo

    data = make_two_view_data(n_per_view=16, n_outputs=3)
    model = _model(data, pad_multiple=8)
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(2)
    neg_elbo = make_shardmap_neg_elbo(model.spec, mesh, model.consts, S=2)
    g_shard = jax.grad(lambda p: neg_elbo(p, model._batch, key))(model.params)
    g_single = jax.grad(
        lambda p: core.negative_elbo(model.spec, p, model.consts, model._batch, key, 2)
    )(model.params)
    for a, b in zip(jax.tree.leaves(g_shard), jax.tree.leaves(g_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_shardmap_elbo_on_2d_mesh():
    """shard_map executor on a (data, model) mesh: the local program is
    replicated over the model axis and must still match single-device."""
    from spatial_alignment_tpu.parallel import make_shardmap_neg_elbo

    data = make_two_view_data(n_per_view=16, n_outputs=4)
    model = _model(data, pad_multiple=4)
    mesh = make_mesh(8, model_parallel=2)  # data=4, model=2
    key = jax.random.PRNGKey(7)
    neg_elbo = make_shardmap_neg_elbo(model.spec, mesh, model.consts, S=2)
    e_shard = float(neg_elbo(model.params, model._batch, key))
    e_single = float(
        core.negative_elbo(model.spec, model.params, model.consts, model._batch, key, 2)
    )
    np.testing.assert_allclose(e_shard, e_single, rtol=1e-5)
