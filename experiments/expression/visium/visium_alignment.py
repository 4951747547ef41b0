"""Two-slice Visium alignment.

TPU-native port of
/root/reference/experiments/expression/visium/visium_alignment.py:42-254:
two sagittal mouse-brain slices, spatially-variable-gene filter by 1-NN R^2,
m = 200 inducing points, template view 0, aligned coordinates dumped to CSV.

Data: pass two .h5ad paths (``--h5ad A.h5ad B.h5ad``; needs X +
obsm['spatial']). Without paths the script runs on a structure-matched
synthetic stand-in (this environment has no network access to fetch the
10x/squidpy datasets).

Run: python experiments/expression/visium/visium_alignment.py [--epochs 2000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import (
    knn_r2_gene_filter,
    load_h5ad,
    synthetic_visium_like,
)

N_GENES = 20
M = 200
N_LATENT_GPS = {"expression": None}


def load(args):
    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], dtype=float) for s in slices]
        return coords, counts, "real"
    coords, counts = synthetic_visium_like(n_spots=600, n_genes=50)
    args.m = min(args.m, 100)  # the stand-in's GP genes carry less spatial
    # information per gene than real Visium data; m=200 over-parameterizes
    return coords, counts, "synthetic stand-in"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--m", type=int, default=M)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    coords, counts, source = load(args)
    print(f"data: {source}; slices {[c.shape for c in coords]}")

    # normalize each slice to [0, 10]^2 (reference preprocessing pattern)
    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]

    # spatially-variable-gene filter on the template slice
    keep = knn_r2_gene_filter(coords[0], counts[0], n_genes=N_GENES)
    Y_list = [c[:, keep] for c in counts]
    # standardize outputs jointly
    Y_all = np.concatenate(Y_list)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    Y_list = [(y - mu) / sd for y in Y_list]

    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(Y_list).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]

    data_dict = {
        "expression": {
            "spatial_coords": X,
            "outputs": Y,
            "n_samples_list": n_samples_list,
        }
    }
    # Fixed warp-kernel hyperparameters guard against the warp-drift
    # degeneracy (the free view migrating to a separate latent region that
    # the data GP memorizes independently). The reference experimented with
    # exactly this (visium_alignment.py:209-210, commented) and its
    # prediction harnesses ship it enabled (two_dimensional_prediction.py:
    # 96-118).
    n_views = len(n_samples_list)
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=min(args.m, min(n_samples_list)),
        m_G=min(args.m, min(n_samples_list)),
        n_latent_gps=N_LATENT_GPS,
        fixed_view_idx=0,
        fixed_warp_kernel_variances=np.ones(n_views) * 0.5,
        fixed_warp_kernel_lengthscales=np.ones(n_views) * 10.0,
        seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5, print_every=500)

    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    aligned = G_means["expression"]

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    # CSV artifact dumps, reference pattern (visium_alignment.py:249-252)
    np.savetxt(os.path.join(out_dir, "aligned_coords_visium.csv"), aligned, delimiter=",")
    np.savetxt(os.path.join(out_dir, "X_visium.csv"), X, delimiter=",")
    np.savetxt(os.path.join(out_dir, "Y_visium.csv"), Y, delimiter=",")
    with open(os.path.join(out_dir, "view_idx_visium.json"), "w") as f:
        json.dump({"n_samples_list": [int(n) for n in n_samples_list]}, f)

    summary = {"source": source, "final_loss": float(losses[-1]), "n_genes": N_GENES}
    if n_samples_list[0] == n_samples_list[1]:
        n = n_samples_list[0]
        summary["pre_error"] = float(np.mean(np.sum((X[:n] - X[n:]) ** 2, axis=1)))
        summary["post_error"] = float(
            np.mean(np.sum((aligned[:n] - aligned[n:]) ** 2, axis=1))
        )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
