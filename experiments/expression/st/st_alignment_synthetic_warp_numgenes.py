"""Alignment error vs number of genes, spatially correlated vs uncorrelated.

Port of /root/reference/experiments/expression/st/
st_alignment_synthetic_warp_numgenes.py: take one (real or stand-in) ST
slice, keep genes with positive Moran's I, GP-warp a duplicated view, then
align using either the TOP-k (spatially correlated) or BOTTOM-k (spatially
uncorrelated) genes and record recovery error against the known unwarped
coordinates. Writes the melted CSV + boxplot the reference produces.

Run: python experiments/expression/st/st_alignment_synthetic_warp_numgenes.py
     [--csv layer1.csv] [--repeats 2] [--n-genes 5] [--epochs 1000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import apply_gp_warp, load_st_data, synthetic_st_like
from spatial_alignment_tpu.utils import morans_i


def align_error(X0, X, Y, n_samples_list, keep2_orig_idx, epochs, seed):
    """Fit template-based alignment; error = view 2's aligned coords vs the
    TRUE unwarped coordinates (reference :248-274)."""
    dd = {
        "expression": {
            "spatial_coords": X.astype(np.float32),
            "outputs": Y.astype(np.float32),
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        dd, m_X_per_view=10, m_G=10,
        n_latent_gps={"expression": None}, fixed_view_idx=0, seed=seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    model.fit(n_epochs=epochs, lr=1e-1, S=5)
    G, _, _, _ = model.forward({"expression": X.astype(np.float32)}, vi, Ns)
    aligned2 = np.asarray(G["expression"])[n_samples_list[0]:]
    return float(np.mean(np.sum((X0[keep2_orig_idx] - aligned2) ** 2, axis=1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--n-genes", type=int, nargs="+", default=[5])
    ap.add_argument("--epochs", type=int, default=1000)
    args = ap.parse_args()

    if args.csv:
        coords, counts, _ = load_st_data([args.csv])
        X0, Y0 = coords[0], np.log1p(counts[0])
    else:
        coords, counts = synthetic_st_like(n_slices=1, grid_size=10, n_genes=40)
        X0, Y0 = coords[0], counts[0]
    X0 = 10 * (X0 - X0.min(0)) / (X0.max(0) - X0.min(0))
    Y0 = (Y0 - Y0.mean(0)) / (Y0.std(0) + 1e-8)

    # Rank genes by spatial autocorrelation; keep positive-I genes, then
    # order so the head is "spatially correlated" and the tail isn't.
    I = morans_i(X0, Y0)
    order = np.argsort(-I)
    order = order[I[order] >= 0.0]
    Y0 = Y0[:, order]
    n0 = X0.shape[0]

    rows = []
    for rep in range(args.repeats):
        rng = np.random.default_rng(rep)
        X, Yw, n_samples_list, _ = apply_gp_warp(
            X0, Y0, 2, kernel_variance=0.1, kernel_lengthscale=10.0,
            noise_variance=1e-1, rng=rng,
        )
        keep1 = rng.choice(n0, int(0.8 * n0), replace=False)
        keep2 = rng.choice(n0, int(0.8 * n0), replace=False)
        sel = np.concatenate([keep1, keep2 + n0])
        Xr, Ywr = X[sel], Yw[sel]
        nsl = [len(keep1), len(keep2)]
        Xr[: nsl[0]] = X0[keep1]  # view 1 is the unwarped template

        for k in args.n_genes:
            for corr, cols in (("Spatially correlated", slice(0, k)),
                               ("Spatially uncorrelated", slice(-k, None))):
                err = align_error(
                    X0, Xr, Ywr[:, cols], nsl, keep2, args.epochs, seed=rep
                )
                rows.append({"variable": k, "value": err, "Type": corr})
                print(f"rep={rep} k={k} [{corr}] error={err:.4f}", flush=True)

    import pandas as pd

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_dir, "st_alignment_synthetic_warp_numgenes.csv"))
    # JSON twin (committed artifact; consumed by
    # plot_synthetic_warp_numgenes_results.py)
    import json

    with open(
        os.path.join(out_dir, "st_alignment_synthetic_warp_numgenes.json"), "w"
    ) as f:
        json.dump({"rows": rows}, f, indent=1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    plt.figure(figsize=(12, 5))
    sns.boxplot(data=df, x="variable", y="value", hue="Type")
    plt.xlabel("Number of genes")
    plt.ylabel("Error")
    plt.legend(loc="center left", bbox_to_anchor=(1, 0.5))
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "st_alignment_synthetic_warp_numgenes.png"))
    plt.close()


if __name__ == "__main__":
    main()
