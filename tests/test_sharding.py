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


def test_sharded_step_matches_single_device_whitened():
    """The whitened parameterization composes with pjit sharding: one train
    step on the 8-device mesh matches the single-device step (the whitened
    predictive/KL paths introduce no new cross-shard structure)."""
    data = make_two_view_data(n_per_view=16, n_outputs=3)
    m_shard = _model(data, pad_multiple=8, whitened_variational=True)
    m_single = _model(data, whitened_variational=True)
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
        a, b = np.asarray(a), np.asarray(b)
        # The two layouts reduce in different orders, so each leaf carries an
        # absolute f32 noise floor proportional to its largest element —
        # small elements inside a large-magnitude leaf cannot be held to a
        # tighter atol than that.
        atol = 1e-4 * (1.0 + np.abs(b).max())
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=atol)


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


def test_shardmap_train_step_matches_single_device_step():
    """One optimizer step through the explicit-collective executor must match
    the single-device step (same key, full-noise-then-slice design)."""
    from spatial_alignment_tpu.parallel import make_shardmap_train_step

    data = make_two_view_data(n_per_view=24, n_outputs=4)
    model = _model(data, pad_multiple=4, n_latent_gps={"expression": 2})
    m_single = _model(data, n_latent_gps={"expression": 2})
    mesh = make_mesh(4)
    key = jax.random.PRNGKey(21)

    step, init = make_shardmap_train_step(model.spec, mesh, model.consts, S=3)
    p2, _, l2 = step(model.params, init(model.params), model._batch, key)

    step_s, opt_s = m_single.make_train_step(lr=1e-2, S=3)
    p1, _, l1 = step_s(m_single.params, opt_s, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_sharded_fit_to_convergence_matches_single_device():
    """Sharded training must CONVERGE like single-device training, not just
    match one step (VERDICT r1 item 6): 2500 scanned steps on a (4,2) mesh
    vs the same single-device; converged aligned-MSE within 5%."""
    from spatial_alignment_tpu.data import generate_twod_data

    rng = np.random.default_rng(0)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 10, grid_size=8, n_latent_gps=None,
        kernel_variance=0.5, kernel_lengthscale=5.0, noise_variance=1e-3,
        fixed_view_idx=0, rng=rng,
    )
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    data = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": nsl}}
    N_STEPS = 2500

    def run_scanned(step, params, opt_state, batch, key):
        def body(carry, _):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            if batch is None:
                p, o, l = step(params, opt_state, sub)
            else:
                p, o, l = step(params, opt_state, batch, sub)
            return (p, o, key), l

        (params, _, _), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=N_STEPS
        )
        return params, losses

    def aligned_error(model, params):
        model.params = params
        vi, Ns, _, _ = model.create_view_idx_dict(data)
        G, _, _, _ = model.forward({"expression": X}, vi, Ns)
        Gm = np.asarray(G["expression"])
        return float(
            np.mean(np.sum((Gm[view_idx[0]] - Gm[view_idx[1]]) ** 2, axis=1))
        )

    kw = dict(m_X_per_view=16, m_G=16, n_latent_gps={"expression": None},
              fixed_view_idx=0, seed=0)
    m_single = sat.VariationalGPSA(data, **kw)
    m_shard = sat.VariationalGPSA(data, pad_multiple=4, **kw)
    mesh = make_mesh(8, model_parallel=2)
    distribute(m_shard, mesh)

    step_s, opt_s = m_single.make_train_step(lr=1e-2, S=3)
    p1, losses1 = run_scanned(step_s, m_single.params, opt_s, None, jax.random.PRNGKey(0))

    from spatial_alignment_tpu.parallel import make_shardmap_train_step

    step_d, init = make_shardmap_train_step(m_shard.spec, mesh, m_shard.consts, S=3)
    p2, losses2 = run_scanned(
        step_d, m_shard.params, init(m_shard.params), m_shard._batch,
        jax.random.PRNGKey(0),
    )

    err_single = aligned_error(m_single, p1)
    err_shard = aligned_error(m_shard, p2)
    pre = float(np.mean(np.sum((X[view_idx[0]] - X[view_idx[1]]) ** 2, axis=1)))
    assert float(losses2[-1]) < float(losses2[0])
    assert err_shard < pre / 3, (pre, err_shard)  # actually aligns
    np.testing.assert_allclose(err_shard, err_single, rtol=0.05)


def test_shardmap_minibatch_unbiased():
    """The stratified per-shard minibatch estimator must be unbiased for the
    full-batch ELBO: mean over key draws matches the mean of the
    (itself MC-sampled) single-device full-batch objective."""
    from spatial_alignment_tpu.parallel import make_shardmap_neg_elbo

    data = make_two_view_data(n_per_view=24, n_outputs=3)
    model = _model(data, pad_multiple=4)
    mesh = make_mesh(4)
    neg_elbo_mb = make_shardmap_neg_elbo(
        model.spec, mesh, model.consts, S=1, minibatch_size=16
    )
    full = jax.jit(
        lambda key: core.negative_elbo(
            model.spec, model.params, model.consts, model._batch, key, 1
        )
    )
    n = 250
    mb_vals = np.array(
        [float(neg_elbo_mb(model.params, model._batch, jax.random.PRNGKey(i)))
         for i in range(n)]
    )
    full_vals = np.array([float(full(jax.random.PRNGKey(10_000 + i))) for i in range(n)])
    se = np.sqrt(mb_vals.var(ddof=1) / n + full_vals.var(ddof=1) / n)
    assert abs(mb_vals.mean() - full_vals.mean()) < 4.0 * se + 1e-6


def test_shardmap_minibatch_handles_all_padding_shards():
    """Shards whose local slice is pure padding contribute weight 0: the
    estimate stays finite and unbiased on an uneven layout (18 real of 24
    padded -> 2 of 8 shards are empty)."""
    from spatial_alignment_tpu.parallel import make_shardmap_neg_elbo

    data = make_two_view_data(n_per_view=18, n_outputs=3)
    model = _model(data, pad_multiple=8)
    assert model.spec.modality("expression").n_padded == 24
    mesh = make_mesh(8)
    neg_elbo_mb = make_shardmap_neg_elbo(
        model.spec, mesh, model.consts, S=1, minibatch_size=16
    )
    g = jax.grad(
        lambda p: neg_elbo_mb(p, model._batch, jax.random.PRNGKey(0))
    )(model.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
    full = jax.jit(
        lambda key: core.negative_elbo(
            model.spec, model.params, model.consts, model._batch, key, 1
        )
    )
    n = 200
    mb_vals = np.array(
        [float(neg_elbo_mb(model.params, model._batch, jax.random.PRNGKey(i)))
         for i in range(n)]
    )
    full_vals = np.array([float(full(jax.random.PRNGKey(10_000 + i))) for i in range(n)])
    se = np.sqrt(mb_vals.var(ddof=1) / n + full_vals.var(ddof=1) / n)
    assert abs(mb_vals.mean() - full_vals.mean()) < 4.0 * se + 1e-6


def test_shardmap_minibatch_training_improves_elbo():
    from spatial_alignment_tpu.parallel import make_shardmap_train_step

    data = make_two_view_data(n_per_view=24, n_outputs=3)
    model = _model(data, pad_multiple=4)
    mesh = make_mesh(4)
    step, init = make_shardmap_train_step(
        model.spec, mesh, model.consts, S=2, lr=1e-2, minibatch_size=16
    )
    params, opt_state = model.params, init(model.params)
    key = jax.random.PRNGKey(0)
    for i in range(150):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, model._batch, sub)
    assert np.isfinite(float(loss))
    e0 = float(core.negative_elbo(
        model.spec, model.params, model.consts, model._batch, jax.random.PRNGKey(1), 3
    ))
    e1 = float(core.negative_elbo(
        model.spec, params, model.consts, model._batch, jax.random.PRNGKey(1), 3
    ))
    assert e1 < e0 - 1.0


def test_pjit_distribute_composes_with_minibatch():
    """Minibatch training on a distributed model (round 3): make_train_step /
    fit route through the stratified per-shard shard_map sampler, so the
    subsample never gathers across shards."""
    data = make_two_view_data(n_per_view=24, n_outputs=4)
    model = _model(data, pad_multiple=4)
    distribute(model, make_mesh(4))
    step, opt = model.make_train_step(lr=1e-2, S=2, minibatch_size=12)
    params, key = model.params, jax.random.PRNGKey(0)
    for _ in range(10):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
    assert np.isfinite(float(loss))


def test_distributed_minibatch_step_has_no_cross_shard_gather():
    """The compiled distributed minibatch train step must contain NO
    collective beyond the gradient/likelihood all-reduce: no all-gather, no
    all-to-all, no collective-permute (VERDICT r2 item 2 — under pjit the
    device-side subsample gather forced XLA-inserted cross-shard
    collectives every step)."""
    data = make_two_view_data(n_per_view=24, n_outputs=4)
    model = _model(data, pad_multiple=4)
    distribute(model, make_mesh(4))
    step, opt = model.make_train_step(lr=1e-2, S=2, minibatch_size=12)
    key = jax.random.PRNGKey(0)
    hlo = step.lower(model.params, opt, key).compile().as_text()
    assert "all-reduce" in hlo  # the one expected collective
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert bad not in hlo, f"unexpected cross-shard collective: {bad}"


def test_distributed_fit_end_to_end_matches_single_device():
    """The scanned fit() path (donated carries, cached loop) on a distributed
    model: 600 epochs after distribute() on the (4,2) mesh must track the
    single-device fit() loss trajectory, and distribute() must invalidate any
    previously cached train loop (VERDICT r2 item 8)."""
    data = make_two_view_data(n_per_view=16, n_outputs=4)
    kw = dict(m_X_per_view=8, m_G=8, n_latent_gps={"expression": 2},
              fixed_view_idx=0, seed=0)
    m_single = sat.VariationalGPSA(data, **kw)
    m_shard = sat.VariationalGPSA(data, pad_multiple=4, **kw)
    assert m_shard.spec.modality("expression").n_padded == 16

    # prime the loop cache BEFORE distribute() to exercise invalidation
    m_shard.fit(n_epochs=5, lr=1e-2, S=2)
    cached = m_shard._train_loop_cache["loop"]

    distribute(m_shard, make_mesh(8, model_parallel=2))
    losses_d = m_shard.fit(n_epochs=600, lr=1e-2, S=2)
    assert m_shard._train_loop_cache["loop"] is not cached  # invalidated
    losses_s = m_single.fit(n_epochs=600, lr=1e-2, S=2)

    assert np.isfinite(losses_d).all()
    # same objective, same init, different RNG streams -> compare converged
    # tail levels, not per-step values
    tail_d = float(np.mean(losses_d[-100:]))
    tail_s = float(np.mean(losses_s[-100:]))
    np.testing.assert_allclose(tail_d, tail_s, rtol=0.05)
    # params end up finite and usable through the normal surface
    X = data["expression"]["spatial_coords"]
    G, _, _, _ = m_shard.forward({"expression": X}, S=1)
    assert np.isfinite(np.asarray(G["expression"])).all()


def test_distributed_fit_minibatch_runs_and_improves():
    """fit(minibatch_size=B) on a distributed model — the user-facing path —
    trains through the scanned loop + stratified sampler and improves the
    full-batch ELBO."""
    data = make_two_view_data(n_per_view=24, n_outputs=3)
    model = _model(data, pad_multiple=4)
    distribute(model, make_mesh(4))
    e0 = float(core.negative_elbo(
        model.spec, model.params, model.consts, model._batch,
        jax.random.PRNGKey(1), 3,
    ))
    losses = model.fit(n_epochs=200, lr=1e-2, S=2, minibatch_size=16)
    assert np.isfinite(losses).all()
    e1 = float(core.negative_elbo(
        model.spec, model.params, model.consts, model._batch,
        jax.random.PRNGKey(1), 3,
    ))
    assert e1 < e0 - 1.0


def test_model_sharded_grads_finite_including_fixed_view():
    """Regression: with the variational state sharded over the model axis,
    the fixed (template) view's dead parameters must get exactly-zero
    gradients, not NaN. A single batched Cholesky/solve whose lanes mixed
    replicated Grams with model-sharded Omega_sqt_F made the SPMD
    partitioner emit NaN into the zero-weight lanes (distribute() now
    clears spec.merged_factor_dispatch to keep the slabs uniform)."""
    data = make_two_view_data(n_per_view=16, n_outputs=4)
    kw = dict(m_X_per_view=8, m_G=8, n_latent_gps={"expression": 2},
              fixed_view_idx=0, seed=0)
    m_single = sat.VariationalGPSA(data, **kw)
    m_shard = sat.VariationalGPSA(data, pad_multiple=4, **kw)
    distribute(m_shard, make_mesh(8, model_parallel=2))
    assert not m_shard.spec.merged_factor_dispatch
    assert m_single.spec.merged_factor_dispatch  # single-device keeps merge

    def loss(model):
        def f(p):
            return core.negative_elbo(
                model.spec, p, model.consts, model._batch,
                jax.random.PRNGKey(0), 2,
            )
        return jax.jit(jax.value_and_grad(f))(model.params)

    l_s, g_s = loss(m_single)
    l_d, g_d = loss(m_shard)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=2e-4)
    for path, arr in jax.tree_util.tree_flatten_with_path(g_d)[0]:
        assert np.isfinite(np.asarray(arr)).all(), jax.tree_util.keystr(path)
    # dead (fixed-view) lanes: exactly zero, matching single-device
    np.testing.assert_array_equal(np.asarray(g_d["Xtilde"][0]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(g_d["warp_kernel_lengthscales"])[0], 0.0
    )


def test_multistart_restarts_over_devices_matches_single(two_view_data=None):
    """fit_multistart on a distributed model shards the restart axis over
    the mesh devices (VERDICT r4 item 3): same winner quality as the
    single-device vectorized path, and the restart-stacked training really
    spans the mesh."""
    data = make_two_view_data(n_per_view=24, n_outputs=4, warp_sigma=0.3)
    kw = dict(fixed_view_idx=0, seed=0)
    m_single = _model(data, **kw)
    losses_single = m_single.fit_multistart(
        n_epochs=60, n_restarts=4, S=2, verbose=False, vectorized=True
    )
    score_single = m_single._alignment_consistency(
        {
            "expression": np.asarray(
                m_single.predict(
                    {"expression": data["expression"]["spatial_coords"]}
                )[0]["expression"]
            )
        }
    )

    m_dist = _model(data, pad_multiple=4, **kw)
    distribute(m_dist, make_mesh(4))
    # the restart axis spans all 4 devices during training
    params_R, losses_RT = m_dist._fit_restarts_vectorized(
        n_epochs=10, n_restarts=4, seed0=0, S=2
    )
    leaf = jax.tree.leaves(params_R)[0]
    assert len(leaf.sharding.device_set) == 4, leaf.sharding
    assert losses_RT.shape == (4, 10) and np.isfinite(losses_RT).all()

    losses_dist = m_dist.fit_multistart(
        n_epochs=60, n_restarts=4, S=2, verbose=False, vectorized=True
    )
    assert np.isfinite(losses_dist).all()
    score_dist = m_dist._alignment_consistency(
        {
            "expression": np.asarray(
                m_dist.predict(
                    {"expression": data["expression"]["spatial_coords"]}
                )[0]["expression"]
            )
        }
    )
    # same init seeds + same RNG stream derivation -> same winner basin;
    # spec differs only by the distribute() dispatch edits (bit-parity per
    # matrix pinned in test_factor_pass), so scores agree to float noise.
    np.testing.assert_allclose(score_dist, score_single, rtol=2e-2)
    np.testing.assert_allclose(
        losses_dist[-1], losses_single[-1], rtol=2e-2
    )
    # winner params recommitted to the model mesh: next distributed train
    # step runs directly
    step, opt = m_dist.make_train_step(lr=1e-2, S=2)
    _, _, l = step(m_dist.params, opt, jax.random.PRNGKey(0))
    assert np.isfinite(float(l))


def test_multistart_restart_padding_on_mesh():
    """n_restarts not divisible by the device count: padded internally,
    sliced back."""
    data = make_two_view_data(n_per_view=16, n_outputs=3)
    m = _model(data, pad_multiple=4)
    distribute(m, make_mesh(4))
    params_R, losses_RT = m._fit_restarts_vectorized(
        n_epochs=8, n_restarts=3, seed0=0, S=2
    )
    assert losses_RT.shape == (3, 8)
    assert jax.tree.leaves(params_R)[0].shape[0] == 3
    assert np.isfinite(losses_RT).all()


def test_multistart_minibatch_on_mesh_is_local():
    """Distributed multistart with minibatch SVI uses the per-restart local
    subsample (not the shard_map executor) and stays finite."""
    data = make_two_view_data(n_per_view=24, n_outputs=3)
    m = _model(data, pad_multiple=4)
    distribute(m, make_mesh(4))
    losses = m.fit_multistart(
        n_epochs=20, n_restarts=4, S=2, verbose=False, vectorized=True,
        minibatch_size=8,
    )
    assert np.isfinite(losses).all()

def test_distributed_checkpoint_roundtrip_exact(tmp_path):
    """Distributed fit -> save -> class-load -> re-distribute -> exact resume
    matches an uninterrupted distributed fit bit-for-bit (VERDICT r4 item 4:
    distributed checkpointing; same guarantee the single-device resume has)."""
    data = make_two_view_data(n_per_view=16, n_outputs=3)
    mesh = make_mesh(8)

    m_full = _model(data, pad_multiple=8, seed=2)
    distribute(m_full, mesh)
    losses_full = m_full.fit(n_epochs=14, lr=1e-2, S=2, chunk_size=7)

    m_a = _model(data, pad_multiple=8, seed=2)
    distribute(m_a, mesh)
    losses_a = m_a.fit(n_epochs=7, lr=1e-2, S=2, chunk_size=7)
    path = str(tmp_path / "dist.npz")
    m_a.save(path)

    m_b = sat.VariationalGPSA.load(path)
    distribute(m_b, mesh)
    losses_b = m_b.fit(n_epochs=7, lr=1e-2, S=2, chunk_size=7, resume_from=path)

    np.testing.assert_array_equal(
        np.concatenate([losses_a, losses_b]), losses_full
    )
    for a, b in zip(jax.tree.leaves(m_full.params), jax.tree.leaves(m_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distributed_aligned_coords_match_single_device():
    """The deliverable — aligned coordinates — after a multi-step distributed
    fit matches the single-device trajectory (VERDICT r4 item 4: parity on
    coordinates, not just losses). Same per-step keys via fit's RNG chain:
    both models share seed, so the carry-key chains are identical."""
    data = make_two_view_data(n_per_view=16, n_outputs=3)
    m_single = _model(data, seed=4)
    m_shard = _model(data, pad_multiple=8, seed=4)
    distribute(m_shard, make_mesh(8))
    l1 = m_single.fit(n_epochs=30, lr=1e-2, S=2, chunk_size=10)
    l2 = m_shard.fit(n_epochs=30, lr=1e-2, S=2, chunk_size=10)
    rel = np.abs(l1 - l2) / np.maximum(np.abs(l1), 1.0)
    assert rel.max() < 5e-3, rel.max()
    X = {"expression": data["expression"]["spatial_coords"]}
    G1, _, _ = m_single.predict(X)
    G2, _, _ = m_shard.predict(X)
    np.testing.assert_allclose(
        G1["expression"], G2["expression"], atol=2e-2, rtol=0
    )
