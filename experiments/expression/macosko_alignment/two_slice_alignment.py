"""Whole-brain Slide-seq two-slice alignment with 90-degree pre-rotation.

Port of /root/reference/experiments/expression/macosko_alignment/
two_slice_alignment.py:28-80: rotate slice 2 by 90 degrees (coarse manual
pre-alignment), then GPSA-align.

Run: python experiments/expression/macosko_alignment/two_slice_alignment.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import (
    load_h5ad,
    rotate_coords,
    synthetic_slideseq_like,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--epochs", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--auto-prealign", action="store_true")
    args = ap.parse_args()

    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], float) for s in slices]
        source = "real"
    else:
        coords, counts = synthetic_slideseq_like(
            n_beads=1000, seed=args.seed, rotation=90.0
        )
        source = "synthetic stand-in"

    if args.auto_prealign:
        from spatial_alignment_tpu.utils import coarse_affine_prealign

        coords = coarse_affine_prealign(coords, counts, template_idx=0)
    else:
        coords[1] = rotate_coords(coords[1], -90.0)  # coarse pre-alignment
    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    Y_all = np.concatenate(counts)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts = [(y - mu) / sd for y in counts]

    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(counts).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]
    data_dict = {
        "expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}
    }
    model = VariationalGPSA(
        data_dict, m_X_per_view=80, m_G=80,
        n_latent_gps={"expression": 10}, fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=3, print_every=500)
    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(
        os.path.join(out_dir, "aligned_coords_macosko.csv"),
        G_means["expression"],
        delimiter=",",
    )
    print(json.dumps({"source": source, "final_loss": float(losses[-1])}, indent=2))


if __name__ == "__main__":
    main()
