"""Cross-slice residual variance before alignment (Visium).

Port of /root/reference/experiments/expression/visium/
visium_variance_experiment.py: select highly variable genes by Poisson
deviance, Pearson-residual normalize, smooth slice 2 from slice 1 with a
distance-weighted 1-NN regressor, and map the per-spot residual (the
cross-slice disagreement a warp must explain) for an example gene; record
per-gene residual variance pre vs post alignment.

Run: python experiments/expression/visium/visium_variance_experiment.py
     [--h5ad s1.h5ad s2.h5ad] [--epochs 2000] [--gene-idx 3]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import load_h5ad, synthetic_visium_like
from spatial_alignment_tpu.utils import pearson_residuals


def smooth_residuals(X_from, Y_from, X_to, Y_to):
    """Y_to minus the distance-weighted 1-NN prediction from the other slice
    (reference :142-147)."""
    from sklearn.neighbors import KNeighborsRegressor

    nn = KNeighborsRegressor(n_neighbors=1, weights="distance")
    nn.fit(X_from, Y_from)
    return Y_to - nn.predict(X_to)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--m", type=int, default=50)
    ap.add_argument("--gene-idx", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--raw-counts", action="store_true",
                    help="inputs are raw counts: apply Pearson residuals")
    args = ap.parse_args()

    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], float) for s in slices]
    else:
        coords, counts = synthetic_visium_like(n_spots=600, n_genes=30, seed=args.seed)

    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    if args.raw_counts:
        counts = [pearson_residuals(c, theta=100.0) for c in counts]
    counts = [(y - y.mean(0)) / (y.std(0) + 1e-8) for y in counts]
    X1, X2 = coords
    Y1, Y2 = counts

    resid_pre = smooth_residuals(X1, Y1, X2, Y2)

    # Align, then recompute the residuals in the shared coordinate system.
    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(counts).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}}
    model = VariationalGPSA(
        dd, m_X_per_view=args.m, m_G=args.m,
        n_latent_gps={"expression": min(20, Y.shape[1])},
        fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    model.fit(n_epochs=args.epochs, lr=1e-2, S=5, print_every=500)
    G, _, _, _ = model.forward({"expression": X}, vi, Ns)
    aligned = np.asarray(G["expression"])
    A1, A2 = aligned[vi["expression"][0]], aligned[vi["expression"][1]]
    resid_post = smooth_residuals(A1, Y1, A2, Y2)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = args.gene_idx
    plt.figure(figsize=(15, 4))
    for panel, (c, v, title, cmap) in enumerate(
        [
            (X1, Y1[:, g], "Sample 1", None),
            (X2, Y2[:, g], "Sample 2", None),
            (X2, resid_pre[:, g], "Difference", "bwr"),
        ]
    ):
        plt.subplot(1, 3, panel + 1)
        plt.title(title)
        plt.scatter(c[:, 0], c[:, 1], c=v, s=7, marker="h", cmap=cmap)
        plt.colorbar()
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "visium_difference_one_gene.png"))
    plt.close()

    out = {
        "residual_variance_pre_mean": float(resid_pre.var(axis=0).mean()),
        "residual_variance_post_mean": float(resid_post.var(axis=0).mean()),
        "per_gene_residual_variance_pre": [float(v) for v in resid_pre.var(axis=0)],
        "per_gene_residual_variance_post": [float(v) for v in resid_post.var(axis=0)],
    }
    with open(os.path.join(out_dir, "variance_experiment.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(
        f"mean cross-slice residual variance: pre={out['residual_variance_pre_mean']:.4f} "
        f"post={out['residual_variance_post_mean']:.4f}"
    )


if __name__ == "__main__":
    main()
