"""Plot the saved Slide-seq alignment: observed vs aligned bead positions plus
the landmark-distance summary.

One-to-one counterpart of /root/reference/experiments/expression/slideseq/
plot_slideseq_alignment.py (scatter of observed/aligned coordinates with
hand-placed anatomical landmarks over out/*.csv). The producing harness here
is slideseq_alignment.py (aligned_coords/X/view_idx CSVs) and
compute_landmark_distances.py (landmark_distances.json).

Run: python experiments/expression/slideseq/plot_slideseq_alignment.py
"""

import json
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "out")


def main():
    aligned = np.loadtxt(
        os.path.join(OUT, "aligned_coords_slideseq.csv"), delimiter=","
    )
    x_path = os.path.join(OUT, "X_slideseq.csv")
    v_path = os.path.join(OUT, "view_idx_slideseq.csv")
    if not (os.path.exists(x_path) and os.path.exists(v_path)):
        raise SystemExit(
            "run slideseq_alignment.py first (writes X_slideseq.csv / "
            "view_idx_slideseq.csv next to aligned_coords_slideseq.csv)"
        )
    X = np.loadtxt(x_path, delimiter=",")
    view_of = np.loadtxt(v_path).astype(int)

    fig, axes = plt.subplots(1, 2, figsize=(13, 6))
    colors = ["#2266aa", "#cc6644", "#44aa77", "#aa44aa"]
    for title, coords, ax in (("Observed", X, axes[0]), ("Aligned", aligned, axes[1])):
        for v in np.unique(view_of):
            pts = coords[view_of == v]
            ax.scatter(pts[:, 0], pts[:, 1], s=4, alpha=0.6,
                       color=colors[v % len(colors)], label=f"view {v}")
        ax.set_title(title)
        ax.set_aspect("equal")
        ax.legend(fontsize=9, markerscale=3)

    lm_path = os.path.join(OUT, "landmark_distances.json")
    if os.path.exists(lm_path):
        with open(lm_path) as f:
            lm = json.load(f)
        fig.suptitle(
            f"Slide-seq alignment — landmark distance "
            f"{lm['pre_mean_distance']:.3f} → {lm['post_mean_distance']:.3f}",
            fontsize=12,
        )

    fig.tight_layout()
    out = os.path.join(OUT, "slideseq_alignment.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
