"""MLE vs variational alignment on the synthetic two-view grid.

Port of /root/reference/experiments/simulations/two_dimensional_mle.py:55-126
(which used the pre-packaging ``WarpGPMLE``; SURVEY.md §2.3). Compares the
maximum-likelihood variant (free aligned coordinates, exact GP marginals)
against the variational model on the same data.

Run: python experiments/simulations/two_dimensional_mle.py
"""

import argparse

import numpy as np

from _common import fit_and_align, view_error, write_result

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from spatial_alignment_tpu import WarpGPMLE  # noqa: E402
from spatial_alignment_tpu.data import generate_twod_data  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X, Y, nsl, vi = generate_twod_data(
        2, 10, grid_size=8, n_latent_gps=None,
        kernel_variance=0.1, kernel_lengthscale=5.0, noise_variance=1e-3,
        fixed_view_idx=0, rng=rng,
    )
    pre = view_error(X, vi[0], vi[1])

    # MLE variant (reference config: fixed warp hyperparams, template view 0)
    dd = {
        "expression": {
            "spatial_coords": X.astype(np.float32),
            "outputs": Y.astype(np.float32),
            "n_samples_list": nsl,
        }
    }
    mle = WarpGPMLE(
        dd,
        fixed_warp_kernel_variances=np.ones(2) * 0.01,
        fixed_warp_kernel_lengthscales=np.ones(2) * 10.0,
        fixed_view_idx=0,
        seed=args.seed,
    )
    mle_losses = mle.fit(n_epochs=args.epochs, lr=1e-2)
    post_mle = view_error(mle.G["expression"], vi[0], vi[1])

    # Variational model on the same data
    aligned_vi, loss_vi = fit_and_align(
        X, Y, nsl, n_epochs=args.epochs, seed=args.seed
    )
    post_vi = view_error(aligned_vi, vi[0], vi[1])

    write_result(
        "mle_vs_variational.json",
        {
            "pre": pre,
            "post_mle": post_mle,
            "post_variational": post_vi,
            "mle_final_loss": float(mle_losses[-1]),
            "vi_final_loss": loss_vi,
        },
    )


if __name__ == "__main__":
    main()
