"""Moran's I spatial autocorrelation, pre vs post alignment.

Port of /root/reference/experiments/expression/visium/visium_morans_i.py:
73-143 and moransi_post_alignment.py: per-gene Moran's I computed on the
observed coordinates and again on the aligned coordinates of the pooled
slices — alignment should increase spatial coherence of expression. The
reference uses squidpy; here the statistic is computed directly
(spatial_alignment_tpu.utils.morans_i).

Reads the CSV artifacts written by visium_alignment.py (run that first), or
pass --from-scratch to run a quick alignment inline.

Run: python experiments/expression/visium/visium_morans_i.py [--from-scratch]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu.utils import morans_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-scratch", action="store_true")
    ap.add_argument("--epochs", type=int, default=5000)
    args = ap.parse_args()

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    needed = [
        os.path.join(out_dir, f)
        for f in ("X_visium.csv", "Y_visium.csv", "aligned_coords_visium.csv")
    ]
    if args.from_scratch or not all(os.path.exists(p) for p in needed):
        print("artifacts missing -> running visium_alignment inline")
        import subprocess

        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "visium_alignment.py"),
                "--epochs",
                str(args.epochs),
            ],
            check=True,
        )

    X = np.loadtxt(needed[0], delimiter=",")
    Y = np.loadtxt(needed[1], delimiter=",")
    aligned = np.loadtxt(needed[2], delimiter=",")

    I_pre = morans_i(X, Y, n_neighbors=6)
    I_post = morans_i(aligned, Y, n_neighbors=6)
    out = {
        "morans_i_pre_mean": float(I_pre.mean()),
        "morans_i_post_mean": float(I_post.mean()),
        "per_gene_pre": I_pre.tolist(),
        "per_gene_post": I_post.tolist(),
        "improved_genes": int(np.sum(I_post > I_pre)),
        "n_genes": int(len(I_pre)),
    }
    with open(os.path.join(out_dir, "morans_i.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(
        json.dumps(
            {k: v for k, v in out.items() if not k.startswith("per_gene")}, indent=2
        )
    )


if __name__ == "__main__":
    main()
