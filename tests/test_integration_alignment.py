"""Tier-3 integration (SURVEY.md §4): synthetic-warp recovery end to end.

The full pipeline — generator -> model -> scanned training -> aligned
coordinates — must reduce the between-view error substantially. Thresholds
are deliberately loose (CPU, few epochs); the accuracy oracles live in
experiments/simulations/two_dimensional_denovo_vs_templatebased.py.
"""

import numpy as np

import spatial_alignment_tpu as sat
from spatial_alignment_tpu.data import generate_twod_data


def _run(fixed_view_idx, seed=0, n_epochs=800, kernel_variance=0.1):
    rng = np.random.default_rng(seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 10, grid_size=8, n_latent_gps=None,
        kernel_variance=kernel_variance, kernel_lengthscale=5.0, noise_variance=1e-3,
        fixed_view_idx=0, rng=rng,
    )
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": nsl}}
    model = sat.VariationalGPSA(
        dd, m_X_per_view=16, m_G=16, n_latent_gps={"expression": None},
        fixed_view_idx=fixed_view_idx, seed=seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    losses = model.fit(n_epochs=n_epochs, lr=1e-2, S=3)
    G, _, _, _ = model.forward({"expression": X}, vi, Ns)
    err = lambda c: float(np.mean(np.sum((c[view_idx[0]] - c[view_idx[1]]) ** 2, axis=1)))
    return err(X), err(G["expression"]), losses


def test_template_alignment_recovers_warp():
    # template mode converges slower (the free view travels the whole warp
    # distance) and has an error floor ~0.05 at this tiny config, so use a
    # strong warp (pre-error well above the floor) and more epochs
    pre, post, losses = _run(fixed_view_idx=0, n_epochs=2500, kernel_variance=0.5)
    assert np.isfinite(losses).all()
    assert post < pre / 3, (pre, post)


def test_denovo_alignment_recovers_warp():
    pre, post, losses = _run(fixed_view_idx=None)
    assert np.isfinite(losses).all()
    assert post < pre / 3, (pre, post)
