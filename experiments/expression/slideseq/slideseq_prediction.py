"""Slide-seq two-puck alignment + held-out prediction.

TPU-native port of
/root/reference/experiments/expression/slideseq/slideseq_prediction.py:
outlier removal by 10-NN distance (:110-136), coarse manual rotation
pre-alignment (:110-136), alignment, then held-out prediction of dropped
view-2 beads scored by per-gene Pearson r against a KNN baseline (:270-417).

Data: pass two .h5ad paths via --h5ad; otherwise a structure-matched
synthetic stand-in (rotated, warped, with outlier beads) is used.

Run: python experiments/expression/slideseq/slideseq_prediction.py
"""

import argparse
import json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--rotate", type=float, default=-20.0,
                    help="coarse pre-rotation of puck 2 (degrees)")
    ap.add_argument("--auto-prealign", action="store_true",
                    help="replace the manual rotation with automatic "
                         "expression-moment affine pre-alignment")
    ap.add_argument("--n-beads", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], dtype=float) for s in slices]
        source = "real"
    else:
        coords, counts = synthetic_slideseq_like(n_beads=args.n_beads, seed=args.seed)
        source = "synthetic stand-in"
    rng = np.random.default_rng(args.seed)

    # outlier removal (10-NN distance filter)
    for i in range(2):
        keep = remove_outlier_spots(coords[i], n_neighbors=10, quantile=0.98)
        coords[i], counts[i] = coords[i][keep], counts[i][keep]
    # coarse pre-alignment of puck 2: manual rotation (reference pattern) or
    # automatic expression-moment matching
    if args.auto_prealign:
        from spatial_alignment_tpu.utils import coarse_affine_prealign

        coords = coarse_affine_prealign(coords, counts, template_idx=0)
    else:
        coords[1] = rotate_coords(coords[1], args.rotate)
    # normalize to [0, 10]^2 and standardize outputs
    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    Y_all = np.concatenate(counts)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts = [(y - mu) / sd for y in counts]

    # drop a test fraction of puck 2
    n2 = coords[1].shape[0]
    test_idx = rng.choice(n2, int(n2 * FRAC_TEST), replace=False)
    keep_idx = np.setdiff1d(np.arange(n2), test_idx)

    X_train = np.concatenate([coords[0], coords[1][keep_idx]]).astype(np.float32)
    Y_train = np.concatenate([counts[0], counts[1][keep_idx]]).astype(np.float32)
    X_test = coords[1][test_idx].astype(np.float32)
    Y_test = counts[1][test_idx]
    n_samples_list = [coords[0].shape[0], len(keep_idx)]

    data_dict = {
        "expression": {
            "spatial_coords": X_train,
            "outputs": Y_train,
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=M,
        m_G=M,
        n_latent_gps={"expression": 10},
        fixed_view_idx=0,
        seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=3, print_every=500)

    test_dict = {
        "expression": {
            "spatial_coords": X_test,
            "outputs": Y_test.astype(np.float32),
            "n_samples_list": [0, len(test_idx)],
        }
    }
    vi_t, Ns_t, _, _ = model.create_view_idx_dict(test_dict)
    G_means_test, _, _, F_test = model.forward(
        {"expression": X_test}, vi_t, Ns_t, prediction_mode=True, S=10
    )
    preds = F_test["expression"].mean(axis=0)

    # per-gene Pearson r (slideseq_prediction.py:404-409)
    r_gpsa = np.array(
        [
            pearsonr(Y_test[:, g], preds[:, g]).statistic
            if np.std(preds[:, g]) > 0
            else 0.0
            for g in range(Y_test.shape[1])
        ]
    )

    # GPR refit on ALIGNED coordinates (the reference's winning variant)
    from sklearn.neighbors import KNeighborsRegressor

    G_train, _, _, _ = model.forward({"expression": X_train}, vi, Ns)
    knn_aligned = KNeighborsRegressor(n_neighbors=5).fit(
        G_train["expression"], Y_train
    )
    preds_aligned = knn_aligned.predict(G_means_test["expression"])
    r_gpsa_knn = np.array(
        [
            pearsonr(Y_test[:, g], preds_aligned[:, g]).statistic
            if np.std(preds_aligned[:, g]) > 0
            else 0.0
            for g in range(Y_test.shape[1])
        ]
    )

    # KNN baseline on unaligned coords (slideseq_prediction.py:400-402)
    knn = KNeighborsRegressor(n_neighbors=5).fit(X_train, Y_train)
    preds_knn = knn.predict(X_test)
    r_knn = np.array(
        [
            pearsonr(Y_test[:, g], preds_knn[:, g]).statistic
            if np.std(preds_knn[:, g]) > 0
            else 0.0
            for g in range(Y_test.shape[1])
        ]
    )

    out = {
        "source": source,
        "final_loss": float(losses[-1]),
        "pearson_r_gpsa_mean": float(np.nanmean(r_gpsa)),
        "pearson_r_gpsa_knn_aligned_mean": float(np.nanmean(r_gpsa_knn)),
        "pearson_r_knn_mean": float(np.nanmean(r_knn)),
        "n_train": int(X_train.shape[0]),
        "n_test": int(X_test.shape[0]),
    }
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "slideseq_prediction.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
