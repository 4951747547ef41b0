"""Visualize 1-D GP warp draws and their effect on observations.

Port of /root/reference/experiments/simulations/visualize_oned_warp.py.

Run: python experiments/simulations/visualize_oned_warp.py
"""

import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu.data import generate_oned_data_gp_warp


def main(seed=0):
    rng = np.random.default_rng(seed)
    X, Y, nsl, view_idx = generate_oned_data_gp_warp(
        n_views=2, n_outputs=2, n_samples_per_view=120,
        kernel_variance=0.5, kernel_lengthscale=3.0, rng=rng,
    )
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
    orig = np.linspace(-10, 10, nsl[0])
    for vv, color in ((0, "tab:blue"), (1, "tab:orange")):
        ax1.plot(orig, X[view_idx[vv], 0], color=color, label=f"view {vv + 1} warp")
        ax2.scatter(X[view_idx[vv], 0], Y[view_idx[vv], 0], s=12, color=color)
    ax1.plot(orig, orig, "k--", alpha=0.4, label="identity")
    ax1.set_ylabel("warped coordinate")
    ax1.legend()
    ax2.set_xlabel("observed coordinate")
    ax2.set_ylabel("outcome")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "oned_warp.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
