"""Alignment with mismatched fields of view (partial overlap).

Port of /root/reference/experiments/simulations/two_dimensional_diff_fov.py:
16,59 — view 2 observes only the center square of the tissue (the
partial-overlap generator), exercising ragged view sizes.

Run: python experiments/simulations/two_dimensional_diff_fov.py
"""

import argparse

import numpy as np

from _common import fit_and_align, write_result

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from spatial_alignment_tpu.data import generate_twod_data_partial_overlap  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--grid-size", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X, Y, nsl, view_idx, keep_idx = generate_twod_data_partial_overlap(
        2, 10, grid_size=args.grid_size, n_latent_gps=5,
        kernel_variance=0.25, kernel_lengthscale=5.0, noise_variance=1e-3,
        rng=rng,
    )
    # matched pairs: view-2 spots correspond to the kept view-1 spots
    v1_matched = np.where(keep_idx)[0]
    v2 = view_idx[1]

    def err(coords):
        return float(np.mean(np.sum((coords[v1_matched] - coords[v2]) ** 2, axis=1)))

    pre = err(X)
    aligned, loss = fit_and_align(
        X, Y, nsl, n_latent_gps=5, n_epochs=args.epochs, seed=args.seed
    )
    post = err(aligned)
    write_result(
        "diff_fov.json",
        {
            "n_view1": int(nsl[0]),
            "n_view2": int(nsl[1]),
            "pre": pre,
            "post": post,
            "loss": loss,
        },
    )


if __name__ == "__main__":
    main()
