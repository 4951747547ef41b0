"""Held-out prediction: drop part of view 2, predict it after alignment.

TPU-native port of
/root/reference/experiments/simulations/two_dimensional_prediction.py:37-246:
GPSA prediction at held-out coordinates (warp test coords through the trained
posterior, sample the data GP) vs two sklearn GPR baselines — "union" (one
GPR on pooled unaligned data) and "separate" (per-view GPRs).

Run: python experiments/simulations/two_dimensional_prediction.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data

n_views = 2
n_outputs = 10
m_G = 20
m_X_per_view = 20
N_EPOCHS = 1000
N_LATENT_GPS = {"expression": 3}
FRAC_TEST = 0.2
N_REPEATS = 2


def run_once(seed):
    rng = np.random.default_rng(seed)
    X, Y, n_samples_list, view_idx = generate_twod_data(
        n_views,
        n_outputs,
        grid_size=20,
        n_latent_gps=N_LATENT_GPS["expression"],
        kernel_lengthscale=10.0,
        kernel_variance=0.5,
        rng=rng,
    )
    X -= X.min(0)
    X /= X.max(0)
    X *= 10
    n_per = X.shape[0] // n_views

    # Drop a random subset of view 2 for testing (reference :69-85)
    second_view_idx = view_idx[1]
    n_drop = int(n_per * FRAC_TEST)
    test_idx = rng.choice(second_view_idx, size=n_drop, replace=False)
    keep_idx = np.setdiff1d(second_view_idx, test_idx)
    train_idx = np.concatenate([np.arange(n_per), keep_idx])

    X_train = X[train_idx].astype(np.float32)
    Y_train = Y[train_idx].astype(np.float32)
    X_test = X[test_idx].astype(np.float32)
    Y_test = Y[test_idx].astype(np.float32)
    n_samples_list_train = [n_per, n_per - n_drop]
    n_samples_list_test = [0, n_drop]

    data_dict_train = {
        "expression": {
            "spatial_coords": X_train,
            "outputs": Y_train,
            "n_samples_list": n_samples_list_train,
        }
    }
    data_dict_test = {
        "expression": {
            "spatial_coords": X_test,
            "outputs": Y_test,
            "n_samples_list": n_samples_list_test,
        }
    }

    sq_err = lambda a, b: float(np.mean(np.sum((a - b) ** 2, axis=1)))

    # Baselines (reference :126-155)
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, WhiteKernel

    gpr_union = GaussianProcessRegressor(kernel=RBF() + WhiteKernel())
    gpr_union.fit(X=X_train, y=Y_train)
    error_union = sq_err(gpr_union.predict(X_test), Y_test)

    gpr_sep = GaussianProcessRegressor(kernel=RBF() + WhiteKernel())
    gpr_sep.fit(X=X_train[n_per:], y=Y_train[n_per:])  # view-2-only model
    error_separate = sq_err(gpr_sep.predict(X_test), Y_test)

    # GPSA (reference :96-118: fixed warp kernel hyperparams, lr 1e-1)
    model = VariationalGPSA(
        data_dict_train,
        m_X_per_view=m_X_per_view,
        m_G=m_G,
        n_latent_gps=N_LATENT_GPS,
        mean_function="identity_fixed",
        fixed_warp_kernel_variances=np.ones(n_views) * 0.25,
        fixed_warp_kernel_lengthscales=np.ones(n_views) * 10.0,
        seed=seed,
    )
    vi_train, Ns_train, _, _ = model.create_view_idx_dict(data_dict_train)
    vi_test, Ns_test, _, _ = model.create_view_idx_dict(data_dict_test)

    model.fit(n_epochs=N_EPOCHS, lr=1e-1, S=1)

    G_means_test, _, _, F_samples_test = model.forward(
        {"expression": X_test}, vi_test, Ns_test, prediction_mode=True, S=10
    )
    preds = F_samples_test["expression"].mean(axis=0)
    error_gpsa = sq_err(preds, Y_test)

    # deterministic posterior-mean prediction (no sampling)
    _, F_mean_test, _ = model.predict({"expression": X_test}, vi_test, Ns_test)
    error_gpsa_mean = sq_err(F_mean_test["expression"], Y_test)

    # GPR refit on aligned coordinates (reference :236-244)
    G_means_train, _, _, _ = model.forward({"expression": X_train}, vi_train, Ns_train)
    gpr_gpsa = GaussianProcessRegressor(kernel=RBF() + WhiteKernel())
    gpr_gpsa.fit(X=G_means_train["expression"], y=Y_train)
    error_gpsa_gpr = sq_err(gpr_gpsa.predict(G_means_test["expression"]), Y_test)

    return {
        "union": error_union,
        "separate": error_separate,
        "gpsa": error_gpsa,
        "gpsa_mean": error_gpsa_mean,
        "gpsa_gpr": error_gpsa_gpr,
    }


def main():
    results = []
    for r in range(N_REPEATS):
        t0 = time.time()
        res = run_once(seed=r)
        res["seconds"] = time.time() - t0
        print(json.dumps(res), flush=True)
        results.append(res)
    agg = {
        k: float(np.mean([r[k] for r in results]))
        for k in ["union", "separate", "gpsa", "gpsa_mean", "gpsa_gpr"]
    }
    out = {"repeats": results, "mean": agg}
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "prediction_results.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
