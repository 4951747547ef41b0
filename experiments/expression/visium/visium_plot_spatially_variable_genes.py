"""Spatial maps of the most / least spatially variable Visium genes.

Port of /root/reference/experiments/expression/visium/
visium_plot_spatially_variable_genes.py: rank genes by the 1-NN R^2
spatial-predictability filter used for the alignment gene selection
(visium_alignment.py pattern) and scatter the top and bottom genes on the
slice coordinates.

Run: python experiments/expression/visium/visium_plot_spatially_variable_genes.py
     [--h5ad slice.h5ad] [--n-genes 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu.data import load_h5ad, synthetic_visium_like, knn_r2_gene_filter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", default=None)
    ap.add_argument("--n-genes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.h5ad:
        s = load_h5ad(args.h5ad)
        X = s["spatial"].astype(float)
        Y = np.asarray(s["X"], float)
        gene_names = s.get("var_names", [f"gene_{i}" for i in range(Y.shape[1])])
    else:
        coords, counts = synthetic_visium_like(n_spots=800, n_genes=30, seed=args.seed)
        X, Y = coords[0], counts[0]
        gene_names = [f"gene_{i}" for i in range(Y.shape[1])]

    ranked = knn_r2_gene_filter(X, Y, n_genes=Y.shape[1])
    k = min(args.n_genes, Y.shape[1])
    best, worst = ranked[:k], ranked[-k:]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(5 * k, 10))
    for row, idxs in enumerate([best, worst]):
        for i, g in enumerate(idxs):
            plt.subplot(2, k, row * k + i + 1)
            plt.scatter(X[:, 0], X[:, 1], c=Y[:, g], s=8, marker="h")
            plt.title(str(gene_names[g]))
            plt.axis("off")
    plt.tight_layout()
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "visium_spatially_variable_genes.png")
    plt.savefig(path)
    plt.close()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
