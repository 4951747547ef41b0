"""1-D held-out prediction with grid-initialized inducing points.

Port of /root/reference/experiments/simulations/one_dimensional_prediction.py
(which uses grid_init=True, :115): train on two 1-D views with part of view 2
dropped, predict the held-out outputs.

Run: python experiments/simulations/one_dimensional_prediction.py
"""

import argparse

import numpy as np

from _common import write_result

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from spatial_alignment_tpu import VariationalGPSA  # noqa: E402
from spatial_alignment_tpu.data import generate_oned_data_gp_warp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    n_per = 90
    X, Y, nsl, view_idx = generate_oned_data_gp_warp(
        n_views=2, n_outputs=4, n_samples_per_view=n_per, n_latent_gps=2,
        kernel_variance=0.25, kernel_lengthscale=5.0, noise_variance=1e-3, rng=rng,
    )
    # drop every 5th point of view 2 for testing
    test_local = np.arange(0, n_per, 5)
    keep_local = np.setdiff1d(np.arange(n_per), test_local)
    X_train = np.concatenate([X[:n_per], X[n_per:][keep_local]]).astype(np.float32)
    Y_train = np.concatenate([Y[:n_per], Y[n_per:][keep_local]]).astype(np.float32)
    X_test = X[n_per:][test_local].astype(np.float32)
    Y_test = Y[n_per:][test_local]

    dd = {
        "expression": {
            "spatial_coords": X_train,
            "outputs": Y_train,
            "n_samples_list": [n_per, len(keep_local)],
        }
    }
    # grid_init=True: parity with the reference's 1-D prediction (:115)
    model = VariationalGPSA(
        dd, m_X_per_view=20, m_G=20, data_init=False, grid_init=True,
        n_latent_gps={"expression": 2}, fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5)

    test_dd = {
        "expression": {
            "spatial_coords": X_test,
            "outputs": Y_test.astype(np.float32),
            "n_samples_list": [0, len(test_local)],
        }
    }
    vi_t, Ns_t, _, _ = model.create_view_idx_dict(test_dd)
    _, _, _, F_test = model.forward(
        {"expression": X_test}, vi_t, Ns_t, prediction_mode=True, S=10
    )
    preds = F_test["expression"].mean(axis=0)
    mse = float(np.mean(np.sum((preds - Y_test) ** 2, axis=1)))
    baseline_mse = float(np.mean(np.sum((Y_test - Y_train.mean(0)) ** 2, axis=1)))
    write_result(
        "one_dimensional_prediction.json",
        {"mse_gpsa": mse, "mse_mean_baseline": baseline_mse,
         "loss": float(losses[-1])},
    )


if __name__ == "__main__":
    main()
