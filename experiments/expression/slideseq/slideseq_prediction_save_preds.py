"""Slide-seq prediction over repeats, saving the CSV artifacts for replotting.

Port of /root/reference/experiments/expression/slideseq/
slideseq_prediction_save_preds.py: run the held-out prediction experiment
N_REPEATS times and persist per-gene Pearson-r tables for each method
(prediction_errors_{union,separate,gpsa}.csv; rows = trials, columns =
genes) plus the last trial's raw predictions/truth/gene names
(slideseq_{preds,truth}_gpsa.csv, slideseq_pred_gene_names.csv) — the files
plot_prediction_results.py consumes.

Run: python experiments/expression/slideseq/slideseq_prediction_save_preds.py
     [--repeats 3] [--epochs 3000] [--n-beads 1500]
"""

import argparse
import os
import sys

import numpy as np
from scipy.stats import pearsonr

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import (
    load_h5ad,
    remove_outlier_spots,
    rotate_coords,
    synthetic_slideseq_like,
)

M = 100
FRAC_TEST = 0.2


def per_gene_r(truth, preds):
    return np.array(
        [
            pearsonr(truth[:, g], preds[:, g]).statistic if np.std(preds[:, g]) > 0 else 0.0
            for g in range(truth.shape[1])
        ]
    )


def one_repeat(coords, counts, rep, epochs):
    rng = np.random.default_rng(rep)
    n2 = coords[1].shape[0]
    test_idx = rng.choice(n2, int(n2 * FRAC_TEST), replace=False)
    keep_idx = np.setdiff1d(np.arange(n2), test_idx)
    X_train = np.concatenate([coords[0], coords[1][keep_idx]]).astype(np.float32)
    Y_train = np.concatenate([counts[0], counts[1][keep_idx]]).astype(np.float32)
    X_test = coords[1][test_idx].astype(np.float32)
    Y_test = counts[1][test_idx]
    n_samples_list = [coords[0].shape[0], len(keep_idx)]

    from sklearn.neighbors import KNeighborsRegressor

    # Union: pooled unaligned. Separate: view 2 alone.
    knn_union = KNeighborsRegressor(5).fit(X_train, Y_train)
    r_union = per_gene_r(Y_test, knn_union.predict(X_test))
    knn_sep = KNeighborsRegressor(5).fit(coords[1][keep_idx], counts[1][keep_idx])
    r_separate = per_gene_r(Y_test, knn_sep.predict(X_test))

    dd = {
        "expression": {
            "spatial_coords": X_train,
            "outputs": Y_train,
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        dd, m_X_per_view=M, m_G=M,
        n_latent_gps={"expression": 10}, fixed_view_idx=0, seed=rep,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    model.fit(n_epochs=epochs, lr=1e-2, S=3)

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
    G_train, _, _, _ = model.forward({"expression": X_train}, vi, Ns)
    knn_aligned = KNeighborsRegressor(5).fit(np.asarray(G_train["expression"]), Y_train)
    preds_gpsa = knn_aligned.predict(np.asarray(G_test["expression"]))
    r_gpsa = per_gene_r(Y_test, preds_gpsa)
    return r_union, r_separate, r_gpsa, preds_gpsa, Y_test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--n-beads", type=int, default=1500)
    ap.add_argument("--rotate", type=float, default=-20.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], float) for s in slices]
    else:
        coords, counts = synthetic_slideseq_like(n_beads=args.n_beads, seed=args.seed)
    for i in range(2):
        keep = remove_outlier_spots(coords[i], n_neighbors=10, quantile=0.98)
        coords[i], counts[i] = coords[i][keep], counts[i][keep]
    coords[1] = rotate_coords(coords[1], args.rotate)
    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    Y_all = np.concatenate(counts)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts = [(y - mu) / sd for y in counts]

    rows_u, rows_s, rows_g = [], [], []
    preds_last = truth_last = None
    for rep in range(args.repeats):
        r_u, r_s, r_g, preds_last, truth_last = one_repeat(
            coords, counts, rep, args.epochs
        )
        rows_u.append(r_u)
        rows_s.append(r_s)
        rows_g.append(r_g)
        print(
            f"rep={rep}: r_union={np.nanmean(r_u):.3f} "
            f"r_separate={np.nanmean(r_s):.3f} r_gpsa={np.nanmean(r_g):.3f}",
            flush=True,
        )

    import pandas as pd

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    gene_names = [f"gene_{i}" for i in range(counts[0].shape[1])]
    for rows, name in (
        (rows_u, "union"),
        (rows_s, "separate"),
        (rows_g, "gpsa"),
    ):
        pd.DataFrame(np.asarray(rows), columns=gene_names).to_csv(
            os.path.join(out_dir, f"prediction_errors_{name}.csv")
        )
    pd.DataFrame(preds_last, columns=gene_names).to_csv(
        os.path.join(out_dir, "slideseq_preds_gpsa.csv")
    )
    pd.DataFrame(truth_last, columns=gene_names).to_csv(
        os.path.join(out_dir, "slideseq_truth_gpsa.csv")
    )
    pd.Series(gene_names).to_csv(
        os.path.join(out_dir, "slideseq_pred_gene_names.csv"), index=False
    )
    print(f"wrote prediction artifacts to {out_dir}")


if __name__ == "__main__":
    main()
