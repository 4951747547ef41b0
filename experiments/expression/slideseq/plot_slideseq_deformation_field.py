"""Standalone deformation-field replot from saved alignment CSVs.

Port of /root/reference/experiments/expression/slideseq/
plot_slideseq_deformation_field.py:1-100 — a separate saved-CSV -> figure
tool, so the (slow) alignment fit and the (fast, iterated-on) visualization
are decoupled. Reads the artifacts written by slideseq_alignment.py
(aligned_coords_slideseq.csv, X_slideseq.csv, view_idx_slideseq.csv), then:

  * averages the observed->aligned displacement of spots near each node of
    a regular grid (the reference's neighbor-threshold averaging, done here
    with a KD-tree instead of the O(grid^2 N) pairwise-distance loop);
  * renders an arrow field and the deformed grid (LineCollection pair,
    reference's plot_grid) for the chosen view.

Run after slideseq_alignment.py:
  python experiments/expression/slideseq/plot_slideseq_deformation_field.py
"""

import argparse
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.collections import LineCollection


def plot_grid(x, y, ax=None, **kwargs):
    """Draw a deformed mesh as two families of grid lines (reference helper)."""
    ax = ax or plt.gca()
    segs1 = np.stack((x, y), axis=2)
    segs2 = segs1.transpose(1, 0, 2)
    ax.add_collection(LineCollection(segs1, **kwargs))
    ax.add_collection(LineCollection(segs2, **kwargs))
    ax.autoscale()


def grid_deformation(X_obs, X_aligned, grid_size=20, neighbor_dist=1.0):
    """Grid-node displacement = mean displacement of spots within
    ``neighbor_dist`` of the node (zero where no neighbors)."""
    from scipy.spatial import cKDTree

    x1s = np.linspace(X_obs[:, 0].min(), X_obs[:, 0].max(), grid_size)
    x2s = np.linspace(X_obs[:, 1].min(), X_obs[:, 1].max(), grid_size)
    G1, G2 = np.meshgrid(x1s, x2s)
    nodes = np.stack([G1.ravel(), G2.ravel()], 1)
    disp = X_aligned - X_obs
    tree = cKDTree(X_obs)
    neighborhoods = tree.query_ball_point(nodes, neighbor_dist)
    D = np.zeros_like(nodes)
    for k, idx in enumerate(neighborhoods):
        if idx:
            D[k] = disp[idx].mean(0)
    return G1, G2, D[:, 0].reshape(G1.shape), D[:, 1].reshape(G2.shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out-dir", default=os.path.join(os.path.dirname(__file__), "out")
    )
    ap.add_argument("--view", type=int, default=1, help="view to plot")
    ap.add_argument("--grid-size", type=int, default=20)
    ap.add_argument("--neighbor-dist", type=float, default=1.0)
    args = ap.parse_args()

    aligned = np.loadtxt(
        os.path.join(args.out_dir, "aligned_coords_slideseq.csv"), delimiter=","
    )
    X = np.loadtxt(os.path.join(args.out_dir, "X_slideseq.csv"), delimiter=",")
    view_of = np.loadtxt(
        os.path.join(args.out_dir, "view_idx_slideseq.csv"), dtype=np.int64
    )
    sel = view_of == args.view
    X_obs, X_al = X[sel], aligned[sel]
    assert len(X_obs) == len(X_al) and len(X_obs) > 0

    G1, G2, DX, DY = grid_deformation(
        X_obs, X_al, grid_size=args.grid_size, neighbor_dist=args.neighbor_dist
    )

    fig, ax = plt.subplots(figsize=(7, 7))
    nz = (DX != 0) | (DY != 0)
    ax.quiver(
        G1[nz], G2[nz], DX[nz], DY[nz],
        angles="xy", scale_units="xy", scale=1.0, width=0.003, color="black",
    )
    ax.invert_yaxis()
    ax.set_title(f"Deformation field (view {args.view})")
    fig.savefig(
        os.path.join(args.out_dir, "slideseq_deformation_field.png"),
        dpi=110, bbox_inches="tight",
    )
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(7, 7))
    plot_grid(G1, G2, ax=ax, color="gray", linewidth=0.8)
    plot_grid(G1 + DX, G2 + DY, ax=ax, color="tab:blue", linewidth=1.0)
    ax.invert_yaxis()
    ax.set_title(f"Deformed grid (view {args.view})")
    fig.savefig(
        os.path.join(args.out_dir, "slideseq_deformation_grid.png"),
        dpi=110, bbox_inches="tight",
    )
    plt.close(fig)
    print(
        f"wrote {args.out_dir}/slideseq_deformation_field.png and "
        f"slideseq_deformation_grid.png"
    )


if __name__ == "__main__":
    main()
