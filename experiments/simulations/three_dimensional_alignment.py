"""3-D alignment + common-coordinate reconstruction via G_test imputation.

Synthetic analog of the reference's ST 3-D experiments
(/root/reference/experiments/expression/st/st_alignment_3d.py:67,181-190 —
slice index appended as z-coordinate, n_spatial_dims=3 — and
st_alignment_3d_round2.py:250-301 — dense-grid G_test imputation for
common-coordinate reconstruction).

Four "slices" (views) of the same 2-D expression pattern, each GP-warped in
xy, stacked with z = slice index. After alignment, outputs are imputed on a
dense (gx, gy, gz) grid.

Run: python experiments/simulations/three_dimensional_alignment.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import apply_gp_warp
from spatial_alignment_tpu.ops.kernels import rbf_kernel_numpy

N_VIEWS = 4
GRID = 8
N_OUTPUTS = 6
M = 30
N_EPOCHS = 2000


def main(seed=0, n_epochs=N_EPOCHS):
    rng = np.random.default_rng(seed)
    ax = np.linspace(0, 10, GRID)
    X1, X2 = np.meshgrid(ax, ax)
    X2d = np.stack([X1.ravel(), X2.ravel()], 1)
    n_per = X2d.shape[0]

    K = rbf_kernel_numpy(X2d, X2d, np.array([np.log(1.0), np.log(1.0)]))
    L = np.linalg.cholesky(K + 1e-4 * np.eye(n_per))
    Y2d = L @ rng.standard_normal((n_per, N_OUTPUTS))

    Xw, Yw, n_samples_list, view_idx = apply_gp_warp(
        X2d, Y2d, n_views=N_VIEWS,
        kernel_variance=0.2, kernel_lengthscale=5.0, noise_variance=1e-4, rng=rng,
    )
    # z = slice index (st_alignment_3d.py:67)
    z = np.concatenate([np.full(n_per, vv, dtype=float) for vv in range(N_VIEWS)])
    X3d = np.column_stack([Xw, z]).astype(np.float32)
    Y = Yw.astype(np.float32)

    data_dict = {
        "expression": {
            "spatial_coords": X3d,
            "outputs": Y,
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=M,
        m_G=M,
        n_latent_gps={"expression": None},
        fixed_view_idx=0,
        seed=seed,
    )
    assert model.n_spatial_dims == 3  # derived from data, not the ctor arg
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)

    t0 = time.time()
    losses = model.fit(n_epochs=n_epochs, lr=1e-2, S=5, print_every=500)
    dt = time.time() - t0

    G_means, _, _, _ = model.forward({"expression": X3d}, vi, Ns)
    aligned = G_means["expression"]

    # xy-error between consecutive aligned slices (same underlying pattern)
    def xy_err(coords):
        errs = []
        for vv in range(1, N_VIEWS):
            errs.append(
                np.mean(
                    np.sum(
                        (coords[view_idx[0]][:, :2] - coords[view_idx[vv]][:, :2]) ** 2,
                        axis=1,
                    )
                )
            )
        return float(np.mean(errs))

    pre, post = xy_err(X3d), xy_err(aligned)

    # Common-coordinate reconstruction on a dense 3-D grid (G_test branch)
    gx = np.linspace(0, 10, 10)
    gz = np.linspace(0, N_VIEWS - 1, 5)
    GX, GY, GZ = np.meshgrid(gx, gx, gz)
    dense = np.stack([GX.ravel(), GY.ravel(), GZ.ravel()], 1).astype(np.float32)
    out6 = model.forward(
        {"expression": X3d}, vi, Ns, S=5, G_test={"expression": dense[None]}
    )
    F_test = out6[5]["expression"]  # (S, n_test, P)
    recon = F_test.mean(axis=0)

    out = {
        "pre_xy_error": pre,
        "post_xy_error": post,
        "reconstruction_grid": list(recon.shape),
        "reconstruction_finite": bool(np.isfinite(recon).all()),
        "final_loss": float(losses[-1]),
        "seconds": dt,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "three_dimensional.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
