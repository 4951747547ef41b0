"""Utility tests: convergence checkers, count preprocessing (SURVEY.md §2.1 #5-6)."""

import numpy as np
import pandas as pd
import pytest

from spatial_alignment_tpu.utils import (
    ConvergenceChecker,
    LossNotDecreasingChecker,
    polar_warp,
    get_st_coordinates,
    compute_distance,
    make_pinwheel,
    compute_size_factors,
    poisson_deviance,
    deviance_feature_selection,
    deviance_residuals,
    pearson_residuals,
)


def test_convergence_checker_flat_trace_converged():
    cc = ConvergenceChecker(span=20)
    y = np.ones(50) * 3.0
    assert cc.converged(y, tol=1e-4)


def test_convergence_checker_decreasing_not_converged():
    cc = ConvergenceChecker(span=20)
    y = np.linspace(100, 0, 50)
    assert not cc.converged(y, tol=1e-6)


def test_convergence_checker_smooth_projection():
    cc = ConvergenceChecker(span=10)
    # smoothing projects onto cubic basis: cubic input is a fixed point
    x = np.arange(10, dtype=float)
    y = 1 + 2 * x - 0.1 * x**2 + 0.01 * x**3
    np.testing.assert_allclose(cc.smooth(y), y, rtol=1e-8)


def test_convergence_checker_all_variants():
    cc = ConvergenceChecker(span=10)
    y = np.concatenate([np.linspace(10, 1, 30), np.ones(30)])
    flags = cc.converged_all(y, tol=1e-3)
    assert flags[-1] and not flags[12]


def test_loss_not_decreasing_checker():
    ck = LossNotDecreasingChecker(max_epochs=100, atol=1e-2, window_size=10)
    trace = np.concatenate([np.linspace(100, 10, 50), np.ones(50) * 10])
    fired = [t for t in range(100) if ck.check_loss(t, trace)]
    assert fired and min(fired) > 45  # only after the plateau begins


def test_loss_checker_is_callable_for_fit():
    ck = LossNotDecreasingChecker(max_epochs=10)
    assert ck(0, np.zeros(10)) is False


def test_polar_warp():
    X = np.array([[1.0, 2.0], [3.0, 4.0]])
    out = polar_warp(X, r=np.array([1.0, 2.0]), theta=np.array([0.0, np.pi / 2]))
    np.testing.assert_allclose(out, [[2.0, 2.0], [3.0, 6.0]], atol=1e-8)


def test_get_st_coordinates():
    df = pd.DataFrame(index=["1.5x2.5", "3x4"], data={"a": [0, 0]})
    np.testing.assert_allclose(get_st_coordinates(df), [[1.5, 2.5], [3.0, 4.0]])


def test_compute_distance():
    X1 = np.zeros((3, 2))
    X2 = np.ones((3, 2))
    np.testing.assert_allclose(compute_distance(X1, X2), np.sqrt(2))


def test_make_pinwheel_shape():
    out = make_pinwheel(0.3, 0.1, 5, 20, 0.25)
    assert out.shape == (100, 2) and np.isfinite(out).all()


def test_compute_size_factors_geometric_mean_one(rng):
    m = pd.DataFrame(rng.poisson(5, (20, 8)).astype(float))
    sz = compute_size_factors(m)
    np.testing.assert_allclose(np.exp(np.mean(np.log(sz))), 1.0, rtol=1e-8)


def test_poisson_deviance_null_model_near_zero(rng):
    # constant-rate data: saturated ~ null, deviance small relative to counts
    X = pd.DataFrame(np.full((5, 40), 7.0))
    sz = compute_size_factors(X)
    dev = poisson_deviance(X, sz)
    np.testing.assert_allclose(np.asarray(dev), 0.0, atol=1e-8)


def test_deviance_feature_selection_ranks_variable_genes(rng):
    flat = np.full((1, 30), 10.0)
    variable = np.concatenate([np.full((1, 15), 1.0), np.full((1, 15), 20.0)], axis=1)
    X = pd.DataFrame(np.concatenate([flat, variable]), index=["flat", "variable"])
    devs, names = deviance_feature_selection(X)
    assert devs[list(names).index("variable")] > devs[list(names).index("flat")]


def test_deviance_residuals_poisson_zero_at_mean(rng):
    x = np.full((6, 4), 5.0)
    res = deviance_residuals(x, np.inf)
    np.testing.assert_allclose(res, 0.0, atol=1e-8)


def test_deviance_residuals_nb_finite(rng):
    x = rng.poisson(4, (10, 6)).astype(float) + 1
    res = deviance_residuals(x, theta=10.0)
    assert np.isfinite(res).all()


def test_pearson_residuals_clipping(rng):
    counts = rng.poisson(3, (9, 5)).astype(float)
    counts[0, 0] = 1000  # outlier
    z = pearson_residuals(counts, theta=100.0, clipping=True)
    assert z.max() <= np.sqrt(9) + 1e-9
    z_unclipped = pearson_residuals(counts, theta=100.0, clipping=False)
    assert z_unclipped.max() > z.max()


def test_morans_i_spatial_signal(rng):
    from spatial_alignment_tpu.utils import morans_i

    coords = rng.uniform(0, 10, (200, 2))
    smooth = np.sin(coords[:, 0] / 2.0)         # spatially coherent
    noise = rng.standard_normal(200)            # spatially random
    I = morans_i(coords, np.stack([smooth, noise], 1))
    assert I.shape == (2,)
    assert I[0] > 0.5
    assert abs(I[1]) < 0.25
    assert I[0] > I[1]


def test_landmark_distances():
    from spatial_alignment_tpu.utils import landmark_distances

    a = np.zeros((4, 2))
    b = np.tile([[3.0, 4.0]], (4, 1))
    np.testing.assert_allclose(landmark_distances(a, b), 5.0)
    with pytest.raises(ValueError):
        landmark_distances(a, b[:2])


def test_step_timer_excludes_warmup():
    import time as _time
    from spatial_alignment_tpu.utils import StepTimer

    timer = StepTimer(warmup=2)
    for i in range(5):
        with timer.lap():
            _time.sleep(0.01)
    assert timer.n == 3
    assert 0.005 < timer.seconds_per_step < 0.1


def test_enable_debug_toggles(monkeypatch):
    import jax
    from spatial_alignment_tpu.utils import enable_debug

    try:
        enable_debug(nans=True)
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)


def test_coarse_affine_prealign_recovers_rotation(rng):
    """A rotated+shifted copy with shared expression must be mapped back
    onto the template by moment matching (the step the reference hand-tunes)."""
    from spatial_alignment_tpu.utils import coarse_affine_prealign

    n = 400
    X1 = rng.uniform(0, 10, (n, 2))
    # anisotropic, spatially-structured expression so moments are informative
    Y1 = np.stack(
        [np.sin(X1[:, 0] / 2.0), np.cos(X1[:, 1] / 3.0), X1[:, 0] * X1[:, 1] / 50.0],
        axis=1,
    )
    theta = np.deg2rad(70.0)
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    X2 = X1 @ R.T + np.array([3.0, -2.0])
    aligned = coarse_affine_prealign([X1, X2], [Y1, Y1], template_idx=0)
    np.testing.assert_array_equal(aligned[0], X1)
    resid = np.sqrt(np.mean(np.sum((aligned[1] - X1) ** 2, axis=1)))
    assert resid < 0.3, resid


def test_coarse_affine_prealign_identity_noop(rng):
    from spatial_alignment_tpu.utils import coarse_affine_prealign

    n = 200
    X = rng.uniform(0, 10, (n, 2))
    Y = np.stack([np.sin(X[:, 0]), np.cos(X[:, 1])], axis=1)
    aligned = coarse_affine_prealign([X, X.copy()], [Y, Y.copy()])
    resid = np.sqrt(np.mean(np.sum((aligned[1] - X) ** 2, axis=1)))
    assert resid < 0.15, resid


# ---------------------------------------------------------------------------
# GSEA (utils/gsea.py) + Moran's I significance (utils/metrics.py)
# ---------------------------------------------------------------------------

from spatial_alignment_tpu.utils import (
    load_gmt,
    bh_fdr,
    enrichment_score,
    permutation_gsea,
    fisher_exact_gsea,
    morans_i_test,
)


def test_load_gmt(tmp_path):
    p = tmp_path / "sets.gmt"
    p.write_text("SET_A\tdesc\tg1\tg2\tg3\nSET_B\tdesc\tg4\tg5\n")
    sets = load_gmt(str(p))
    assert sets == {"SET_A": ["g1", "g2", "g3"], "SET_B": ["g4", "g5"]}


def test_bh_fdr_known_values():
    p = np.array([0.01, 0.02, 0.03, 0.04])
    q = bh_fdr(p)
    np.testing.assert_allclose(q, [0.04, 0.04, 0.04, 0.04], rtol=1e-12)
    assert bh_fdr(np.array([0.5]))[0] == 0.5


def test_enrichment_score_top_concentration():
    stats = np.linspace(3, -3, 100)
    top = np.zeros(100, bool)
    top[:10] = True
    spread = np.zeros(100, bool)
    spread[::10] = True
    assert enrichment_score(stats, top) > 0.8
    assert enrichment_score(stats, top) > abs(enrichment_score(stats, spread))


def test_permutation_gsea_finds_planted_set(rng):
    genes = [f"g{i}" for i in range(200)]
    stats = rng.standard_normal(200)
    planted = list(np.array(genes)[np.argsort(-stats)[:15]])  # top genes
    decoy = list(rng.choice(genes, 15, replace=False))
    res = permutation_gsea(genes, stats, {"PLANTED": planted, "DECOY": decoy},
                           n_perm=200, seed=0)
    by_name = {r["pathway"]: r for r in res}
    assert by_name["PLANTED"].get("padj") < 0.05
    assert by_name["PLANTED"]["ES"] > by_name["DECOY"]["ES"]


def test_fisher_exact_gsea_enrichment(rng):
    all_genes = [f"g{i}" for i in range(100)]
    hits = [f"g{i}" for i in range(10)]
    sets = {"GOOD": [f"g{i}" for i in range(12)],
            "BAD": [f"g{i}" for i in range(50, 62)]}
    res = fisher_exact_gsea(hits, all_genes, sets)
    by_name = {r["pathway"]: r for r in res}
    assert by_name["GOOD"]["adj_pval"] < 0.01
    assert by_name["BAD"]["adj_pval"] > 0.5


def test_morans_i_test_significance(rng):
    n = 200
    X = rng.uniform(0, 10, (n, 2))
    smooth = np.sin(X[:, 0]) + np.cos(X[:, 1])
    noise = rng.standard_normal(n)
    res = morans_i_test(X, np.stack([smooth, noise], 1), n_neighbors=6)
    assert res["pval_norm"][0] < 1e-4       # smooth field: significant
    assert res["pval_norm"][1] > 0.01       # white noise: not
    assert res["pval_norm_fdr_bh"][0] <= res["pval_norm"][0] * 2


# ---------------------------------------------------------------------------
# Entropic-OT coarse-alignment baseline (utils/ot.py — the PASTE-style
# comparison column, /root/reference/experiments/simulations/two_dimensional.py:65-82)
# ---------------------------------------------------------------------------
from spatial_alignment_tpu.utils.ot import (  # noqa: E402
    entropic_ot_align_views,
    ot_procrustes_align,
    sinkhorn,
)


def test_sinkhorn_marginals(rng):
    C = rng.uniform(0, 1, (30, 40))
    P = sinkhorn(C, reg=0.1)
    np.testing.assert_allclose(P.sum(1), 1 / 30, atol=1e-6)
    np.testing.assert_allclose(P.sum(0), 1 / 40, atol=1e-6)
    assert (P >= 0).all()


def test_sinkhorn_low_reg_approaches_assignment(rng):
    # With a permutation-structured cost and small reg the coupling should
    # concentrate on the true matching.
    perm = rng.permutation(20)
    C = np.ones((20, 20))
    C[np.arange(20), perm] = 0.0
    P = sinkhorn(C, reg=0.02, n_iters=2000)
    assert (P.argmax(1) == perm).all()


def test_ot_procrustes_recovers_rigid_transform(rng):
    X1 = rng.uniform(0, 10, (50, 2))
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    X2 = (X1 - 3.0) @ R.T
    X2a, Rhat, t = ot_procrustes_align(X1, X2, np.eye(50) / 50)
    np.testing.assert_allclose(X2a, X1, atol=1e-8)
    np.testing.assert_allclose(Rhat @ Rhat.T, np.eye(2), atol=1e-10)


def test_entropic_ot_aligns_rotated_view(rng):
    n = 100
    X0 = rng.uniform(0, 10, (n, 2))
    Y0 = np.stack(
        [np.sin(X0[:, 0] * f) + np.cos(X0[:, 1] * f) for f in (0.5, 0.9, 1.3, 0.3, 0.7)],
        axis=1,
    )
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    X2 = (X0 - 5.0) @ R.T + 5.0 + 0.01 * rng.standard_normal((n, 2))
    X = np.concatenate([X0, X2])
    Y = np.concatenate([Y0, Y0])
    vi = [np.arange(n), np.arange(n, 2 * n)]
    pre = np.mean(np.sum((X[vi[0]] - X[vi[1]]) ** 2, 1))
    Xa = entropic_ot_align_views(X, Y, vi)
    post = np.mean(np.sum((Xa[vi[0]] - Xa[vi[1]]) ** 2, 1))
    assert post < pre / 20, (pre, post)
    # view 0 is the anchor: untouched
    np.testing.assert_allclose(Xa[vi[0]], X[vi[0]])
