"""Spatial maps of the most / least spatially variable Slide-seq genes.

Port of /root/reference/experiments/expression/slideseq/
slideseq_plot_spatially_variable_genes.py: rank genes by spatial
autocorrelation (Moran's I; the reference's ranking comes from squidpy) and
scatter the top and bottom genes on the puck coordinates.

Run: python experiments/expression/slideseq/slideseq_plot_spatially_variable_genes.py
     [--h5ad puck.h5ad] [--n-genes 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu.data import load_h5ad, synthetic_slideseq_like
from spatial_alignment_tpu.utils import morans_i


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
        coords, counts = synthetic_slideseq_like(n_beads=2000, n_genes=30, seed=args.seed)
        X, Y = coords[0], counts[0]
        gene_names = [f"gene_{i}" for i in range(Y.shape[1])]

    I = morans_i(X, Y)
    order = np.argsort(-I)
    k = min(args.n_genes, Y.shape[1])
    best, worst = order[:k], order[-k:]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(5 * k, 10))
    for row, (idxs, label) in enumerate([(best, "most"), (worst, "least")]):
        for i, g in enumerate(idxs):
            plt.subplot(2, k, row * k + i + 1)
            plt.scatter(X[:, 0], X[:, 1], c=Y[:, g], s=4)
            plt.title(f"{gene_names[g]} (I={I[g]:.2f})")
            plt.axis("off")
    plt.tight_layout()
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "slideseq_spatially_variable_genes.png")
    plt.savefig(path)
    plt.close()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
