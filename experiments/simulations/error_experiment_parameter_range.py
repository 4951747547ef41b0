"""Alignment error across fixed warp-hyperparameter settings.

Port of /root/reference/experiments/simulations/
error_experiment_parameter_range.py: sweep fixed warp-kernel (variance,
lengthscale) pairs and record the aligned-view error for each, mapping the
hyperparameter region where alignment succeeds.

Run: python experiments/simulations/error_experiment_parameter_range.py
"""

import argparse
import itertools

import numpy as np

from _common import fit_and_align, view_error, write_result

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from spatial_alignment_tpu.data import generate_twod_data  # noqa: E402

VARIANCES = [0.1, 0.5, 1.0]
LENGTHSCALES = [2.0, 5.0, 10.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X, Y, nsl, vi = generate_twod_data(
        2, 10, grid_size=10, n_latent_gps=5,
        kernel_variance=0.25, kernel_lengthscale=5.0, noise_variance=1e-3,
        fixed_view_idx=0, rng=rng,
    )
    pre = view_error(X, vi[0], vi[1])

    rows = []
    for var, ls in itertools.product(VARIANCES, LENGTHSCALES):
        aligned, loss = fit_and_align(
            X, Y, nsl, n_latent_gps=5, n_epochs=args.epochs, seed=args.seed,
            fixed_warp_kernel_variances=np.ones(2) * var,
            fixed_warp_kernel_lengthscales=np.ones(2) * ls,
        )
        rows.append(
            {"variance": var, "lengthscale": ls,
             "post": view_error(aligned, vi[0], vi[1]), "loss": loss}
        )
        print(rows[-1], flush=True)
    write_result("parameter_range.json", {"pre": pre, "rows": rows})


if __name__ == "__main__":
    main()
