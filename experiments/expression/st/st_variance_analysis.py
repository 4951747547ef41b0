"""Per-gene GP variance decomposition after alignment.

Port of /root/reference/experiments/expression/st/st_variance_analysis.py:
204-299: after aligning the stack, fit the data GP's per-gene structure and
rank genes by the ratio of spatially-explained variance to noise variance on
the aligned coordinates (the reference hands the ranking to GSEA; we emit
the ranked CSV it would consume).

Run: python experiments/expression/st/st_variance_analysis.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import synthetic_st_like, load_st_data
from spatial_alignment_tpu.utils import morans_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", nargs="+", default=None)
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.csv:
        coords_list, counts_list, names = load_st_data(args.csv, n_genes=40)
        counts_list = [np.log1p(c) for c in counts_list]
        gene_names = list(names[0])
    else:
        coords_list, counts_list = synthetic_st_like(n_slices=3, seed=args.seed)
        gene_names = [f"gene_{i}" for i in range(counts_list[0].shape[1])]

    coords_list = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords_list]
    Y_all = np.concatenate(counts_list)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts_list = [(y - mu) / sd for y in counts_list]

    X = np.concatenate(coords_list).astype(np.float32)
    Y = np.concatenate(counts_list).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords_list]
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}}
    model = VariationalGPSA(
        dd, m_X_per_view=40, m_G=40,
        n_latent_gps={"expression": None}, fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    model.fit(n_epochs=args.epochs, lr=1e-2, S=5)
    G_means, _, F_lat, _ = model.forward({"expression": X}, vi, Ns, S=10)
    aligned = G_means["expression"]

    # spatial variance proxy: per-gene variance of the posterior-mean surface
    # (mean over samples) vs residual variance around it
    F_mean = F_lat["expression"].mean(axis=0)  # (N, P)
    spatial_var = F_mean.var(axis=0)
    resid_var = (Y - F_mean).var(axis=0) + 1e-8
    ratio = spatial_var / resid_var
    I_aligned = morans_i(aligned, Y, n_neighbors=6)

    order = np.argsort(-ratio)
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "gene_variance_ranking.csv"), "w") as f:
        f.write("gene,spatial_to_noise_ratio,morans_i\n")
        for i in order:
            f.write(f"{gene_names[i]},{ratio[i]:.6f},{I_aligned[i]:.6f}\n")
    print(
        json.dumps(
            {
                "top_genes": [gene_names[i] for i in order[:5]],
                "mean_ratio": float(ratio.mean()),
                "mean_morans_i": float(I_aligned.mean()),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
