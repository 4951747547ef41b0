"""Render observed-vs-aligned panels from saved alignment artifacts.

Port of /root/reference/experiments/expression/visium/plot_alignment.py
(plotting from saved CSVs rather than a live model). Reads the artifacts
written by visium_alignment.py.

Run: python experiments/expression/visium/plot_alignment.py
"""

import json
import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main(gene_idx=0):
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    X = np.loadtxt(os.path.join(out_dir, "X_visium.csv"), delimiter=",")
    Y = np.loadtxt(os.path.join(out_dir, "Y_visium.csv"), delimiter=",")
    aligned = np.loadtxt(os.path.join(out_dir, "aligned_coords_visium.csv"), delimiter=",")
    with open(os.path.join(out_dir, "view_idx_visium.json")) as f:
        n_samples_list = json.load(f)["n_samples_list"]
    cs = np.insert(np.cumsum(n_samples_list), 0, 0)

    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    markers = [".", "+", "^"]
    for vv in range(len(n_samples_list)):
        idx = slice(cs[vv], cs[vv + 1])
        kw = dict(c=Y[idx, gene_idx], marker=markers[vv % 3], s=40, cmap="viridis")
        axes[0].scatter(X[idx, 0], X[idx, 1], **kw)
        axes[1].scatter(aligned[idx, 0], aligned[idx, 1], **kw)
    axes[0].set_title("Observed data")
    axes[1].set_title("Aligned data")
    path = os.path.join(out_dir, "alignment_panels.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
