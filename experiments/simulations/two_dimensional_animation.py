"""Training animation: aligned-coordinate frames saved over training.

Port of /root/reference/experiments/simulations/two_dimensional_animation.py —
renders a frame of the aligned coordinates every FRAME_EVERY epochs.

Run: python experiments/simulations/two_dimensional_animation.py [--epochs 1000]
"""

import argparse
import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data
from spatial_alignment_tpu.plotting import callback_twod

FRAME_EVERY = 200


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 10, grid_size=10, n_latent_gps=5,
        kernel_variance=0.25, kernel_lengthscale=5.0, noise_variance=1e-3,
        fixed_view_idx=0, rng=rng,
    )
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": nsl}}
    model = VariationalGPSA(
        dd, m_X_per_view=25, m_G=25, n_latent_gps={"expression": 5},
        fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out", "animation")
    os.makedirs(out_dir, exist_ok=True)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 6))

    def frame(model, t, losses):
        G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
        callback_twod(
            model, X, Y, X_aligned=G_means,
            data_expression_ax=ax1, latent_expression_ax=ax2, s=60,
        )
        fig.savefig(os.path.join(out_dir, f"frame_{t:05d}.png"), dpi=80)

    model.fit(
        n_epochs=args.epochs, lr=1e-2, S=5, print_every=FRAME_EVERY, callback=frame
    )
    frame(model, args.epochs, None)
    print(f"frames in {out_dir}")


if __name__ == "__main__":
    main()
