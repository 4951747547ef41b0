"""Visium held-out prediction after alignment.

Port of /root/reference/experiments/expression/visium/visium_prediction.py:
drop a fraction of slice 2's spots, align on the rest, predict the held-out
expression; compare against KNN on unaligned and aligned coordinates.

Run: python experiments/expression/visium/visium_prediction.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import load_h5ad, synthetic_visium_like

FRAC_TEST = 0.2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], float) for s in slices]
    else:
        coords, counts = synthetic_visium_like(n_spots=700, n_genes=20, seed=args.seed)
    rng = np.random.default_rng(args.seed)

    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    Y_all = np.concatenate(counts)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts = [(y - mu) / sd for y in counts]

    n2 = coords[1].shape[0]
    test_idx = rng.choice(n2, int(n2 * FRAC_TEST), replace=False)
    keep_idx = np.setdiff1d(np.arange(n2), test_idx)
    X_train = np.concatenate([coords[0], coords[1][keep_idx]]).astype(np.float32)
    Y_train = np.concatenate([counts[0], counts[1][keep_idx]]).astype(np.float32)
    X_test = coords[1][test_idx].astype(np.float32)
    Y_test = counts[1][test_idx]

    dd = {
        "expression": {
            "spatial_coords": X_train,
            "outputs": Y_train,
            "n_samples_list": [coords[0].shape[0], len(keep_idx)],
        }
    }
    model = VariationalGPSA(
        dd, m_X_per_view=args.m, m_G=args.m,
        n_latent_gps={"expression": 10}, fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=3, print_every=500)

    test_dd = {
        "expression": {
            "spatial_coords": X_test,
            "outputs": Y_test.astype(np.float32),
            "n_samples_list": [0, len(test_idx)],
        }
    }
    vi_t, Ns_t, _, _ = model.create_view_idx_dict(test_dd)
    G_test, _, _, F_test = model.forward(
        {"expression": X_test}, vi_t, Ns_t, prediction_mode=True, S=10
    )
    sq = lambda a, b: float(np.mean(np.sum((a - b) ** 2, axis=1)))
    mse_gpsa = sq(F_test["expression"].mean(axis=0), Y_test)

    from sklearn.neighbors import KNeighborsRegressor

    G_train, _, _, _ = model.forward({"expression": X_train}, vi, Ns)
    knn_aligned = KNeighborsRegressor(5).fit(G_train["expression"], Y_train)
    mse_aligned = sq(knn_aligned.predict(G_test["expression"]), Y_test)
    knn_raw = KNeighborsRegressor(5).fit(X_train, Y_train)
    mse_raw = sq(knn_raw.predict(X_test), Y_test)

    out = {
        "mse_gpsa_sampling": mse_gpsa,
        "mse_knn_aligned": mse_aligned,
        "mse_knn_unaligned": mse_raw,
        "final_loss": float(losses[-1]),
    }
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "prediction.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
