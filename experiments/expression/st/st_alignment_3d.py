"""3-D ST alignment: slice index as z-coordinate + dense-grid reconstruction.

TPU-native port of
/root/reference/experiments/expression/st/st_alignment_3d.py:67,181-190
(n_spatial_dims=3 with z = slice index) and st_alignment_3d_round2.py:250-301
(common-coordinate reconstruction by imputing outputs on a dense
20 x 20 x n_slices G_test grid).

Run: python experiments/expression/st/st_alignment_3d.py [--epochs 2000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import load_st_data, synthetic_st_like

M = 50
GRID_RES = 20


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", nargs="+", default=None)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.csv:
        coords_list, counts_list, _ = load_st_data(args.csv, n_genes=20)
        counts_list = [np.log1p(c) for c in counts_list]
    else:
        coords_list, counts_list = synthetic_st_like(n_slices=4, seed=args.seed)
    n_slices = len(coords_list)

    coords_list = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords_list]
    Y_all = np.concatenate(counts_list)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts_list = [(y - mu) / sd for y in counts_list]

    # append slice index as the z coordinate (st_alignment_3d.py:67)
    X3 = np.concatenate(
        [
            np.column_stack([c, np.full(c.shape[0], float(s))])
            for s, c in enumerate(coords_list)
        ]
    ).astype(np.float32)
    Y = np.concatenate(counts_list).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords_list]

    data_dict = {
        "expression": {"spatial_coords": X3, "outputs": Y, "n_samples_list": n_samples_list}
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=M,
        m_G=M,
        n_latent_gps={"expression": 10},
        fixed_view_idx=0,
        seed=args.seed,
    )
    assert model.n_spatial_dims == 3
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5, print_every=500)

    # dense common-coordinate grid imputation
    g = np.linspace(0, 10, GRID_RES)
    gz = np.linspace(0, n_slices - 1, n_slices)
    GX, GY, GZ = np.meshgrid(g, g, gz)
    dense = np.stack([GX.ravel(), GY.ravel(), GZ.ravel()], 1).astype(np.float32)
    outs = model.forward(
        {"expression": X3}, vi, Ns, S=5, G_test={"expression": dense[None]}
    )
    recon = outs[5]["expression"].mean(axis=0)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "reconstruction_grid.npy"), recon)
    summary = {
        "n_slices": n_slices,
        "final_loss": float(losses[-1]),
        "reconstruction_shape": list(recon.shape),
        "finite": bool(np.isfinite(recon).all()),
    }
    with open(os.path.join(out_dir, "st_3d.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
