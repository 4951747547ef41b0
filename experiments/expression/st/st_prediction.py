"""ST held-out prediction after alignment.

Port of /root/reference/experiments/expression/st/st_prediction.py:1-283:
two ST layers, drop 1/5 of the second layer's spots, align the rest with
fixed warp hyperparameters, then predict the held-out expression by
refitting a Matern GPR on the aligned coordinates; compare against
union-GPR and per-view separate-GPR baselines over repeats.

Run: python experiments/expression/st/st_prediction.py
     [--csv layer1.csv layer2.csv] [--repeats 3] [--epochs 2000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import load_st_data, synthetic_st_like


def gpr_mse(X_tr, Y_tr, X_te, Y_te):
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import Matern, WhiteKernel

    gpr = GaussianProcessRegressor(kernel=Matern(nu=1.5) + WhiteKernel())
    gpr.fit(X_tr, Y_tr)
    preds = gpr.predict(X_te)
    return float(np.mean(np.sum((preds - Y_te) ** 2, axis=1)))


def one_repeat(coords, counts, rep, epochs, m):
    rng = np.random.default_rng(rep)
    n1, n2 = coords[0].shape[0], coords[1].shape[0]
    test_idx = rng.choice(n2, n2 // 5, replace=False)
    keep_idx = np.setdiff1d(np.arange(n2), test_idx)
    X_train = np.concatenate([coords[0], coords[1][keep_idx]]).astype(np.float32)
    Y_train = np.concatenate([counts[0], counts[1][keep_idx]]).astype(np.float32)
    X_test = coords[1][test_idx].astype(np.float32)
    Y_test = counts[1][test_idx]

    # Baselines (reference: st_prediction.py:142-176)
    mse_union = gpr_mse(X_train, Y_train, X_test, Y_test)
    mse_separate = gpr_mse(
        coords[1][keep_idx], counts[1][keep_idx], X_test, Y_test
    )  # only view 2 has test points

    dd = {
        "expression": {
            "spatial_coords": X_train,
            "outputs": Y_train,
            "n_samples_list": [n1, len(keep_idx)],
        }
    }
    model = VariationalGPSA(
        dd,
        m_X_per_view=m,
        m_G=m,
        n_latent_gps={"expression": min(20, Y_train.shape[1])},
        kernel_func_warp="matern32",
        fixed_warp_kernel_variances=np.full(2, 0.25),
        fixed_warp_kernel_lengthscales=np.full(2, 10.0),
        seed=rep,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    model.fit(n_epochs=epochs, lr=1e-2, S=5)

    G_train, _, _, _ = model.forward({"expression": X_train}, vi, Ns)
    test_dd = {
        "expression": {
            "spatial_coords": X_test,
            "outputs": Y_test.astype(np.float32),
            "n_samples_list": [0, len(test_idx)],
        }
    }
    vi_t, Ns_t, _, _ = model.create_view_idx_dict(test_dd)
    G_test, _, _, _ = model.forward(
        {"expression": X_test}, vi_t, Ns_t, prediction_mode=True, S=10
    )
    mse_gpsa = gpr_mse(
        np.asarray(G_train["expression"]), Y_train,
        np.asarray(G_test["expression"]), Y_test,
    )
    return {"union": mse_union, "separate": mse_separate, "gpsa": mse_gpsa}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", nargs=2, default=None, help="two ST layer CSVs")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--m", type=int, default=50)
    args = ap.parse_args()

    if args.csv:
        coords, counts, _ = load_st_data(args.csv, n_genes=50)
        counts = [np.log1p(c) for c in counts]
    else:
        coords, counts = synthetic_st_like(n_slices=2, grid_size=12, n_genes=50)
    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    Y_all = np.concatenate(counts)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts = [(y - mu) / sd for y in counts]

    rows = [
        one_repeat(coords, counts, r, args.epochs, args.m)
        for r in range(args.repeats)
    ]
    for r in rows:
        print(r, flush=True)

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "st_prediction.json"), "w") as f:
        json.dump({"rows": rows}, f, indent=2)

    import pandas as pd

    df = pd.DataFrame(rows).rename(
        columns={"union": "Union", "separate": "Separate", "gpsa": "GPSA"}
    )
    pd.melt(df).to_csv(os.path.join(out_dir, "twod_prediction_comparison_st.csv"))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    plt.figure(figsize=(7, 5))
    sns.boxplot(data=pd.melt(df), x="variable", y="value", color="gray")
    plt.xlabel("")
    plt.ylabel("MSE")
    plt.title("Spatial Transcriptomics")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "two_d_prediction_comparison_st.png"))
    plt.close()


if __name__ == "__main__":
    main()
