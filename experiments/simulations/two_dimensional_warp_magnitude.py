"""Alignment error vs warp magnitude, for GP / linear / polar warp families.

Port of the reference sweep trio
(/root/reference/experiments/simulations/two_dimensional_warp_magnitude.py,
..._linear.py, ..._polar.py) collapsed into one script with ``--warp``.

Run: python experiments/simulations/two_dimensional_warp_magnitude.py \
        [--warp gp|linear|polar] [--epochs 1500]
"""

import argparse

import numpy as np

from _common import fit_and_align, view_error, write_result

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from spatial_alignment_tpu.data import (  # noqa: E402
    apply_gp_warp,
    apply_linear_warp,
    apply_polar_warp,
)
from spatial_alignment_tpu.ops.kernels import rbf_kernel_numpy  # noqa: E402

MAGNITUDES = {
    "gp": [0.1, 0.25, 0.5, 1.0],        # warp kernel variance
    "linear": [0.05, 0.1, 0.2, 0.4],    # slope variance
    "polar": [0.01, 0.05, 0.1, 0.2],    # B-matrix range
}


def make_base(grid_size, n_outputs, rng):
    ax = np.linspace(0, 10, grid_size)
    X1, X2 = np.meshgrid(ax, ax)
    X = np.stack([X1.ravel(), X2.ravel()], 1)
    K = rbf_kernel_numpy(X, X, np.array([np.log(1.0), np.log(1.0)]))
    L = np.linalg.cholesky(K + 1e-4 * np.eye(X.shape[0]))
    Y = L @ rng.standard_normal((X.shape[0], n_outputs))
    return X, Y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warp", choices=["gp", "linear", "polar"], default="gp")
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--grid-size", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X0, Y0 = make_base(args.grid_size, n_outputs=10, rng=rng)

    rows = []
    for mag in MAGNITUDES[args.warp]:
        if args.warp == "gp":
            X, Y, nsl, vi = apply_gp_warp(
                X0, Y0, 2, kernel_variance=mag, kernel_lengthscale=5.0,
                noise_variance=1e-4, rng=rng,
            )
        elif args.warp == "linear":
            X, Y, nsl, vi = apply_linear_warp(
                X0, Y0, 2, linear_slope_variance=mag,
                linear_intercept_variance=mag, noise_variance=1e-4, rng=rng,
            )
        else:
            X, Y, nsl, vi = apply_polar_warp(
                X0, Y0, 2, linear_slope_variance=mag, noise_variance=1e-4, rng=rng,
            )
        pre = view_error(X, vi[0], vi[1])
        aligned, loss = fit_and_align(
            X, Y, nsl, n_epochs=args.epochs, seed=args.seed
        )
        post = view_error(aligned, vi[0], vi[1])
        rows.append({"magnitude": mag, "pre": pre, "post": post, "loss": loss})
        print(rows[-1], flush=True)

    write_result(f"warp_magnitude_{args.warp}.json", {"warp": args.warp, "rows": rows})


if __name__ == "__main__":
    main()
