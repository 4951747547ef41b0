"""WarpGPMLE tests: loss finite/decreasing, fixed-view pinned, alignment improves."""

import numpy as np
import pytest

from spatial_alignment_tpu.models.mle import WarpGPMLE

from conftest import make_two_view_data


def test_mle_loss_and_fit(two_view_data):
    model = WarpGPMLE(
        two_view_data,
        fixed_warp_kernel_variances=np.ones(2) * 0.01,
        fixed_warp_kernel_lengthscales=np.ones(2) * 10.0,
        fixed_view_idx=0,
    )
    l0 = float(model.loss_fn(data_dict=two_view_data))
    assert np.isfinite(l0)
    losses = model.fit(n_epochs=60, lr=1e-2)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_mle_fixed_view_pinned(two_view_data):
    X = two_view_data["expression"]["spatial_coords"]
    model = WarpGPMLE(
        two_view_data,
        fixed_warp_kernel_variances=np.ones(2) * 0.01,
        fixed_warp_kernel_lengthscales=np.ones(2) * 10.0,
        fixed_view_idx=0,
    )
    model.fit(n_epochs=30, lr=1e-2)
    G = model.G["expression"]
    np.testing.assert_allclose(G[:30], X[:30], atol=1e-6)  # fixed view unmoved
    assert not np.allclose(G[30:], X[30:])  # free view moved


def test_mle_alignment_improves():
    data = make_two_view_data(n_per_view=25, n_outputs=4, warp_sigma=0.4, seed=2)
    X = data["expression"]["spatial_coords"]
    model = WarpGPMLE(
        data,
        fixed_warp_kernel_variances=np.ones(2) * 0.1,
        fixed_warp_kernel_lengthscales=np.ones(2) * 10.0,
        fixed_view_idx=0,
    )
    pre = np.mean(np.sum((X[:25] - X[25:]) ** 2, axis=1))
    model.fit(n_epochs=300, lr=1e-2)
    G = model.G["expression"]
    post = np.mean(np.sum((G[:25] - G[25:]) ** 2, axis=1))
    assert post < pre
