"""Alignment robustness vs observation-noise level.

Port of /root/reference/experiments/simulations/two_dimensional_noise_level.py.

Run: python experiments/simulations/two_dimensional_noise_level.py
"""

import argparse

import numpy as np

from _common import fit_and_align, view_error, write_result

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from spatial_alignment_tpu.data import generate_twod_data  # noqa: E402

NOISE_LEVELS = [0.001, 0.01, 0.1, 0.5]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rows = []
    for noise in NOISE_LEVELS:
        rng = np.random.default_rng(args.seed)
        X, Y, nsl, vi = generate_twod_data(
            2, 10, grid_size=10, n_latent_gps=5,
            kernel_variance=0.25, kernel_lengthscale=5.0,
            noise_variance=noise, fixed_view_idx=0, rng=rng,
        )
        pre = view_error(X, vi[0], vi[1])
        aligned, loss = fit_and_align(
            X, Y, nsl, n_latent_gps=5, n_epochs=args.epochs, seed=args.seed
        )
        post = view_error(aligned, vi[0], vi[1])
        rows.append({"noise_variance": noise, "pre": pre, "post": post, "loss": loss})
        print(rows[-1], flush=True)

    write_result("noise_level.json", {"rows": rows})


if __name__ == "__main__":
    main()
