"""Moran's I re-evaluation of a SAVED alignment, with significance calls.

Port of /root/reference/experiments/expression/visium/
moransi_post_alignment.py: load the aligned coordinates written by
visium_alignment.py, compute per-gene Moran's I with normal-approximation
p-values and BH FDR on (a) the pooled observed coordinates ("union") and
(b) the aligned coordinates ("GPSA"), classify GPSA-specific significant
genes (FDR < 0.01 post, > 0.01 pre), and draw the I-vs-I scatter. The
reference uses squidpy; the statistic + test live in
spatial_alignment_tpu.utils.morans_i_test.

Run: python experiments/expression/visium/moransi_post_alignment.py
(run visium_alignment.py first, or artifacts are generated inline)
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu.utils import morans_i_test

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5000)
    ap.add_argument("--fdr", type=float, default=0.01)
    args = ap.parse_args()

    needed = [
        os.path.join(OUT_DIR, f)
        for f in ("X_visium.csv", "Y_visium.csv", "aligned_coords_visium.csv")
    ]
    if not all(os.path.exists(p) for p in needed):
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

    union = morans_i_test(X, Y)
    gpsa = morans_i_test(aligned, Y)

    new_hit = (gpsa["pval_norm_fdr_bh"] < args.fdr) & (
        union["pval_norm_fdr_bh"] > args.fdr
    )
    both_hit = (gpsa["pval_norm_fdr_bh"] < args.fdr) & (
        union["pval_norm_fdr_bh"] < args.fdr
    )

    import pandas as pd

    df = pd.DataFrame(
        {
            "I_union": union["I"],
            "I_gpsa": gpsa["I"],
            "pval_norm_fdr_bh_union": union["pval_norm_fdr_bh"],
            "pval_norm_fdr_bh_gpsa": gpsa["pval_norm_fdr_bh"],
            "new_and_significant": new_hit,
        }
    )
    df.to_csv(os.path.join(OUT_DIR, "moransi_post_alignment.csv"))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(8, 7))
    plt.scatter(df.I_union[~new_hit], df.I_gpsa[~new_hit], c="gray", s=18)
    if new_hit.any():
        plt.scatter(
            df.I_union[new_hit], df.I_gpsa[new_hit], c="tab:red", s=24,
            label=f"GPSA-specific hit (FDR < {args.fdr})",
        )
        plt.legend()
    lim = [min(0, df.I_union.min(), df.I_gpsa.min()), 1]
    plt.plot(lim, lim, color="gray", linestyle="--")
    plt.xlabel("Moran's I, Union")
    plt.ylabel("Moran's I, GPSA")
    plt.tight_layout()
    plt.savefig(os.path.join(OUT_DIR, "moransi_post_alignment.png"))
    plt.close()

    out = {
        "n_genes": int(len(df)),
        "n_significant_union": int((union["pval_norm_fdr_bh"] < args.fdr).sum()),
        "n_significant_gpsa": int((gpsa["pval_norm_fdr_bh"] < args.fdr).sum()),
        "n_gpsa_specific_hits": int(new_hit.sum()),
        "n_hits_in_both": int(both_hit.sum()),
        "mean_I_union": float(union["I"].mean()),
        "mean_I_gpsa": float(gpsa["I"].mean()),
    }
    with open(os.path.join(OUT_DIR, "moransi_post_alignment.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
