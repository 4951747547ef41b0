"""Slide-seq two-puck alignment + deformation-field visualization.

Port of /root/reference/experiments/expression/slideseq/slideseq_alignment.py
and plot_slideseq_deformation_field.py: align two pucks, then render the
learned warp as a quiver field (observed -> aligned displacement).

Run: python experiments/expression/slideseq/slideseq_alignment.py
"""

import argparse
import json
import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import (
    load_h5ad,
    remove_outlier_spots,
    rotate_coords,
    synthetic_slideseq_like,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--n-beads", type=int, default=1200)
    ap.add_argument("--rotate", type=float, default=-20.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], float) for s in slices]
    else:
        coords, counts = synthetic_slideseq_like(n_beads=args.n_beads, seed=args.seed)

    for i in range(2):
        keep = remove_outlier_spots(coords[i], n_neighbors=10, quantile=0.98)
        coords[i], counts[i] = coords[i][keep], counts[i][keep]
    coords[1] = rotate_coords(coords[1], args.rotate)
    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    Y_all = np.concatenate(counts)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts = [(y - mu) / sd for y in counts]

    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(counts).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}}
    model = VariationalGPSA(
        dd, m_X_per_view=80, m_G=80, n_latent_gps={"expression": 10},
        fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=3, print_every=500)
    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    aligned = G_means["expression"]

    # deformation field of the free view: observed -> aligned displacement
    v2 = np.asarray(vi["expression"][1])
    sub = v2[:: max(1, len(v2) // 400)]
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.quiver(
        X[sub, 0], X[sub, 1],
        aligned[sub, 0] - X[sub, 0], aligned[sub, 1] - X[sub, 1],
        angles="xy", scale_units="xy", scale=1.0, width=0.002, color="tab:blue",
    )
    ax.set_title("Learned deformation field (view 2)")
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(os.path.join(out_dir, "deformation_field.png"), dpi=110, bbox_inches="tight")
    np.savetxt(os.path.join(out_dir, "aligned_coords_slideseq.csv"), aligned, delimiter=",")
    # Inputs for the standalone replot tool (the reference's saved-CSV
    # workflow, plot_slideseq_deformation_field.py:24-26)
    np.savetxt(os.path.join(out_dir, "X_slideseq.csv"), X, delimiter=",")
    view_of = np.concatenate(
        [np.full(n, v, np.int64) for v, n in enumerate(n_samples_list)]
    )
    np.savetxt(os.path.join(out_dir, "view_idx_slideseq.csv"), view_of, fmt="%d")
    print(json.dumps({"final_loss": float(losses[-1]),
                      "n_beads": [int(n) for n in n_samples_list]}, indent=2))
    print(f"wrote {out_dir}/deformation_field.png")


if __name__ == "__main__":
    main()
