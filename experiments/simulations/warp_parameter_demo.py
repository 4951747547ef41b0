"""Visualize warp-prior draws across kernel hyperparameters.

Port of /root/reference/experiments/simulations/warp_parameter_demo.py:31-50:
sample GP warps of a regular grid at several (variance, lengthscale) settings
and save a panel figure.

Run: python experiments/simulations/warp_parameter_demo.py
"""

import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu.data import apply_gp_warp

VARIANCES = [0.01, 0.1, 0.5]
LENGTHSCALES = [1.0, 5.0, 10.0]


def main(seed=0):
    rng = np.random.default_rng(seed)
    ax_grid = np.linspace(0, 10, 15)
    X1, X2 = np.meshgrid(ax_grid, ax_grid)
    X0 = np.stack([X1.ravel(), X2.ravel()], 1)
    Y0 = np.zeros((X0.shape[0], 1))

    fig, axes = plt.subplots(
        len(VARIANCES), len(LENGTHSCALES), figsize=(12, 12), sharex=True, sharey=True
    )
    for i, var in enumerate(VARIANCES):
        for j, ls in enumerate(LENGTHSCALES):
            Xw, _, _, _ = apply_gp_warp(
                X0, Y0, n_views=1, kernel_variance=var, kernel_lengthscale=ls, rng=rng
            )
            ax = axes[i, j]
            ax.scatter(X0[:, 0], X0[:, 1], s=4, c="lightgray")
            ax.scatter(Xw[:, 0], Xw[:, 1], s=6, c="tab:blue")
            ax.set_title(f"var={var}, ls={ls}", fontsize=9)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "warp_parameter_demo.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
