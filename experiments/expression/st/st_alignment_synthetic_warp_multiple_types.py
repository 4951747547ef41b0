"""Synthetic-warp recovery on ST data across warp families (GP/linear/polar).

Port of /root/reference/experiments/expression/st/
st_alignment_synthetic_warp_multiple_types.py: one ST slice duplicated and
distorted with each warp family in turn, aligned template-based, recovery
error recorded per repeat; writes the combined melted CSV + grouped boxplot
(PASTE baseline omitted — package not in this image, as in
experiments/simulations/two_dimensional.py).

Run: python experiments/expression/st/st_alignment_synthetic_warp_multiple_types.py
     [--csv layer1.csv] [--repeats 3] [--epochs 3000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import (
    apply_gp_warp,
    apply_linear_warp,
    apply_polar_warp,
    load_st_data,
    synthetic_st_like,
)

WARP_LABELS = {"gp": "GP", "linear": "Linear", "polar": "Polar"}


def apply_warp(kind, X0, Y0, rng):
    if kind == "gp":
        return apply_gp_warp(
            X0, Y0, 2, kernel_variance=0.1, kernel_lengthscale=10.0,
            noise_variance=0.0, rng=rng,
        )
    if kind == "linear":
        return apply_linear_warp(
            X0, Y0, 2, linear_slope_variance=0.05,
            linear_intercept_variance=0.05, noise_variance=0.0, rng=rng,
        )
    return apply_polar_warp(
        X0, Y0, 2, linear_slope_variance=0.05, noise_variance=0.0, rng=rng
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--m", type=int, default=40)
    args = ap.parse_args()

    if args.csv:
        coords, counts, _ = load_st_data([args.csv], n_genes=30)
        X0, Y0 = coords[0], np.log1p(counts[0])
    else:
        coords, counts = synthetic_st_like(n_slices=1, grid_size=12, n_genes=30)
        X0, Y0 = coords[0], counts[0]
    X0 = 10 * (X0 - X0.min(0)) / (X0.max(0) - X0.min(0))
    Y0 = (Y0 - Y0.mean(0)) / (Y0.std(0) + 1e-8)
    n0 = X0.shape[0]

    rows = []
    for kind, label in WARP_LABELS.items():
        for rep in range(args.repeats):
            rng = np.random.default_rng(100 * rep + 7)
            X, Y, nsl, vi = apply_warp(kind, X0, Y0, rng)
            X = X.astype(np.float32)
            X[: nsl[0]] = X0  # template view stays unwarped
            dd = {
                "expression": {
                    "spatial_coords": X,
                    "outputs": Y.astype(np.float32),
                    "n_samples_list": nsl,
                }
            }
            model = VariationalGPSA(
                dd, m_X_per_view=args.m, m_G=args.m,
                n_latent_gps={"expression": None}, fixed_view_idx=0, seed=rep,
            )
            vd, Ns, _, _ = model.create_view_idx_dict(dd)
            model.fit(n_epochs=args.epochs, lr=1e-2, S=5)
            G, _, _, _ = model.forward({"expression": X}, vd, Ns)
            aligned2 = np.asarray(G["expression"])[nsl[0]:]
            err = float(np.mean(np.sum((X0 - aligned2) ** 2, axis=1)))
            pre = float(np.mean(np.sum((X0 - X[nsl[0]:]) ** 2, axis=1)))
            rows.append(
                {"Warp type": label, "variable": "GPSA", "value": err, "pre": pre}
            )
            print(f"{label} rep={rep}: pre={pre:.4f} post={err:.4f}", flush=True)

    import pandas as pd

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(out_dir, "st_alignment_synthetic_warp_multiple_types.csv"))
    # JSON twin of the CSV (the committed artifact class in this repo;
    # consumed by plot_st_alignment_multiple_types.py)
    import json

    with open(
        os.path.join(out_dir, "st_alignment_synthetic_warp_multiple_types.json"), "w"
    ) as f:
        json.dump({"rows": rows}, f, indent=1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    plt.figure(figsize=(10, 5))
    sns.boxplot(data=df, x="Warp type", y="value", hue="variable")
    plt.ylabel("Error")
    plt.legend(loc="center left", bbox_to_anchor=(1, 0.5))
    plt.tight_layout()
    plt.savefig(
        os.path.join(out_dir, "st_alignment_synthetic_warp_multiple_types.png")
    )
    plt.close()


if __name__ == "__main__":
    main()
