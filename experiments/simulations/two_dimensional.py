"""Canonical two-view 2-D alignment run with result panels.

Port of /root/reference/experiments/simulations/two_dimensional.py:44-183,
including the optimal-transport baseline column: the reference reports GPSA
against PASTE (two_dimensional.py:65-82); the PASTE package is absent from
this image, so the same recipe (expression-driven OT coupling + weighted
Procrustes stacking) is reproduced by utils/ot.py (entropic Sinkhorn).

Run: python experiments/simulations/two_dimensional.py [--epochs 3000]
"""

import argparse
import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from _common import fit_and_align, view_error, write_result

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from spatial_alignment_tpu.data import generate_twod_data  # noqa: E402
from spatial_alignment_tpu.utils.ot import entropic_ot_align_views  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X, Y, nsl, vi = generate_twod_data(
        2, 10, grid_size=10, n_latent_gps=5,
        kernel_variance=0.25, kernel_lengthscale=5.0, noise_variance=1e-3,
        fixed_view_idx=0, rng=rng,
    )
    pre = view_error(X, vi[0], vi[1])

    # OT baseline (PASTE-style): expression-OT coupling + rigid Procrustes
    import time as _time
    t0 = _time.time()
    X_ot = entropic_ot_align_views(X, Y, vi)
    ot_seconds = _time.time() - t0
    ot_err = view_error(X_ot, vi[0], vi[1])

    aligned, loss = fit_and_align(
        X, Y, nsl, m=50, n_latent_gps=5, n_epochs=args.epochs, seed=args.seed
    )
    post = view_error(aligned, vi[0], vi[1])

    fig, axes = plt.subplots(1, 2, figsize=(14, 6))
    markers = ["o", "X"]
    for panel, coords, title in ((0, X, "Data"), (1, aligned, "Aligned")):
        for vv in range(2):
            axes[panel].scatter(
                coords[vi[vv], 0], coords[vi[vv], 1], c=Y[vi[vv], 0],
                marker=markers[vv], s=80, linewidth=1.2, edgecolor="black",
                cmap="viridis",
            )
        axes[panel].set_title(title)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(os.path.join(out_dir, "two_dimensional.png"), dpi=110, bbox_inches="tight")

    write_result("two_dimensional.json", {
        "pre": pre, "post": post, "loss": loss,
        "ot_baseline_error": ot_err, "ot_baseline_seconds": ot_seconds,
    })


if __name__ == "__main__":
    main()
