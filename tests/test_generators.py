"""Synthetic-generator tests (SURVEY.md §2.2 #9-11)."""

import numpy as np
import pytest

from spatial_alignment_tpu.data import (
    apply_gp_warp,
    apply_gp_warp_multimodal,
    apply_linear_warp,
    apply_polar_warp,
    generate_oned_data_affine_warp,
    generate_oned_data_gp_warp,
    generate_twod_data,
    generate_twod_data_partial_overlap,
)


@pytest.fixture
def grid():
    ax = np.linspace(0, 10, 5)
    X1, X2 = np.meshgrid(ax, ax)
    return np.vstack([X1.ravel(), X2.ravel()]).T  # (25, 2)


def test_apply_gp_warp_shapes(grid, rng):
    Y0 = rng.standard_normal((25, 3))
    X, Y, n_list, view_idx = apply_gp_warp(
        grid, Y0, n_views=2, kernel_variance=0.1, kernel_lengthscale=5.0, rng=rng
    )
    assert X.shape == (50, 2) and Y.shape == (50, 3)
    assert n_list == [25, 25]
    np.testing.assert_array_equal(view_idx[0], np.arange(25))
    # outputs replicated across views (noise_variance=0)
    np.testing.assert_array_equal(Y[:25], Y[25:])
    # warp actually moved points, but smoothly (bounded displacement)
    assert not np.allclose(X[:25], grid)
    assert np.abs(X - np.tile(grid, (2, 1))).max() < 5.0


def test_apply_gp_warp_zero_variance_near_identity(grid, rng):
    X, _, _, _ = apply_gp_warp(
        grid, rng.standard_normal((25, 2)), n_views=2,
        kernel_variance=1e-8, kernel_lengthscale=5.0, rng=rng,
    )
    np.testing.assert_allclose(X[:25], grid, atol=1e-2)


def test_apply_gp_warp_mean_transform(grid, rng):
    X, _, _, _ = apply_gp_warp(
        grid, rng.standard_normal((25, 2)), n_views=1,
        kernel_variance=1e-10, kernel_lengthscale=5.0,
        mean_slope=2.0, mean_intercept=1.0, rng=rng,
    )
    np.testing.assert_allclose(X, grid * 2.0 + 1.0, atol=1e-2)


def test_apply_linear_warp(grid, rng):
    Y0 = rng.standard_normal((25, 3))
    X, Y, n_list, view_idx = apply_linear_warp(
        grid, Y0, n_views=3, noise_variance=0.0, rng=rng
    )
    assert X.shape == (75, 2) and len(n_list) == 3
    # each view is an exact affine image of the grid
    for vv in range(3):
        Xv = X[view_idx[vv]]
        A, res, *_ = np.linalg.lstsq(
            np.hstack([grid, np.ones((25, 1))]), Xv, rcond=None
        )
        np.testing.assert_allclose(np.hstack([grid, np.ones((25, 1))]) @ A, Xv, atol=1e-8)


def test_apply_polar_warp(grid, rng):
    Y0 = rng.standard_normal((25, 3))
    X, Y, n_list, view_idx = apply_polar_warp(grid, Y0, n_views=2, rng=rng)
    assert X.shape == (50, 2)
    # displacement magnitude equals |r| = |first polar param|
    assert np.isfinite(X).all()


def test_apply_gp_warp_multimodal(rng):
    Xe = rng.uniform(0, 4, (20, 2))
    Xh = rng.uniform(0, 4, (12, 2))
    Ye = rng.standard_normal((20, 3))
    Yh = rng.standard_normal((12, 5))
    X_list, Y_list, n_lists, _ = apply_gp_warp_multimodal(
        [Xe, Xh], [Ye, Yh], n_views=2, kernel_variance=0.01, rng=rng
    )
    assert len(X_list) == 2
    assert X_list[0].shape == (40, 2) and X_list[1].shape == (24, 2)
    assert Y_list[0].shape == (40, 3) and Y_list[1].shape == (24, 5)
    assert n_lists[0] == [20, 20] and n_lists[1] == [12, 12]
    # rescaled coordinate range ~ [0, 10] plus warp
    assert X_list[0].min() > -6 and X_list[0].max() < 16


def test_generate_twod_data(rng):
    X, Y, n_list, view_idx = generate_twod_data(
        n_views=2, n_outputs=4, grid_size=5, n_latent_gps=2,
        kernel_variance=0.1, rng=rng,
    )
    assert X.shape == (50, 2) and Y.shape == (50, 4)
    assert n_list == [25, 25]


def test_generate_twod_data_fixed_view(rng):
    X, Y, n_list, view_idx = generate_twod_data(
        n_views=2, n_outputs=2, grid_size=5, fixed_view_idx=0, rng=rng
    )
    ax = np.linspace(0, 10, 5)
    X1, X2 = np.meshgrid(ax, ax)
    grid = np.vstack([X1.ravel(), X2.ravel()]).T
    np.testing.assert_array_equal(X[view_idx[0]], grid)


def test_generate_twod_partial_overlap(rng):
    X, Y, n_list, view_idx, keep_idx = generate_twod_data_partial_overlap(
        n_views=2, n_outputs=3, grid_size=6, rng=rng
    )
    assert n_list[0] == 36 and n_list[1] == int(keep_idx.sum()) < 36
    assert X.shape[0] == sum(n_list) and Y.shape[0] == sum(n_list)
    assert len(view_idx[1]) == n_list[1]


def test_generate_oned_affine(rng):
    X, Y, n_list, view_idx = generate_oned_data_affine_warp(
        n_views=2, n_outputs=3, n_samples_per_view=15,
        scale_factor=1.5, additive_factor=0.2, rng=rng,
    )
    assert X.shape == (30, 1) and Y.shape == (30, 3)
    np.testing.assert_allclose(X[15:], X[:15] * 1.5 + 0.2, rtol=1e-6)


def test_generate_oned_gp_warp_lmc_two_outputs(rng):
    X, Y, n_list, view_idx = generate_oned_data_gp_warp(
        n_views=2, n_outputs=2, n_samples_per_view=12, n_latent_gps=1, rng=rng
    )
    # special-cased W = [1, -1] (generate_oned_data.py:110-112)
    np.testing.assert_allclose(Y[:, 0], -Y[:, 1], atol=1e-8)


def test_generators_feed_model(rng):
    """Generated data plugs straight into VariationalGPSA."""
    import spatial_alignment_tpu as sat

    X, Y, n_list, _ = generate_twod_data(
        n_views=2, n_outputs=3, grid_size=4, kernel_variance=0.05, rng=rng
    )
    dd = {"expression": {"spatial_coords": X.astype(np.float32),
                         "outputs": Y.astype(np.float32),
                         "n_samples_list": n_list}}
    model = sat.VariationalGPSA(dd, m_X_per_view=6, m_G=6,
                                n_latent_gps={"expression": None})
    assert np.isfinite(model.neg_elbo(S=2))
