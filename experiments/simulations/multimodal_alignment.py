"""Multimodal joint alignment: expression + histology in one data_dict.

Synthetic analog of the reference's Visium multimodal experiment
(/root/reference/experiments/expression/visium/visium_multimodal_alignment.py:
70-117,276-318): two modalities with different spot sets and output
dimensionalities share one per-view warp; ``n_noise_variance_params=3`` gives
each modality its own observation noise (the last n_modalities params are
used, vgpsa.py:534).

Run: python experiments/simulations/multimodal_alignment.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import apply_gp_warp_multimodal
from spatial_alignment_tpu.ops.kernels import rbf_kernel_numpy

N_VIEWS = 2
M_X_PER_VIEW = 25
M_G = 25
N_EPOCHS = 2000


def main(seed=0, n_epochs=N_EPOCHS):
    rng = np.random.default_rng(seed)

    # expression: 150 spots x 10 genes; histology: 300 pixels x 3 channels
    n_expr, n_hist = 150, 300
    X_expr = rng.uniform(0, 10, (n_expr, 2))
    X_hist = rng.uniform(0, 10, (n_hist, 2))

    def gp_outputs(X, p):
        K = rbf_kernel_numpy(X, X, np.array([np.log(1.0), np.log(1.0)]))
        L = np.linalg.cholesky(K + 1e-4 * np.eye(X.shape[0]))
        return L @ rng.standard_normal((X.shape[0], p))

    Y_expr = gp_outputs(X_expr, 10)
    Y_hist = gp_outputs(X_hist, 3)

    X_list, Y_list, n_lists, _ = apply_gp_warp_multimodal(
        [X_expr, X_hist],
        [Y_expr, Y_hist],
        n_views=N_VIEWS,
        kernel_variance=0.25,
        kernel_lengthscale=5.0,
        noise_variance=1e-4,
        rng=rng,
    )

    data_dict = {
        "expression": {
            "spatial_coords": X_list[0].astype(np.float32),
            "outputs": Y_list[0].astype(np.float32),
            "n_samples_list": n_lists[0],
        },
        "histology": {
            "spatial_coords": X_list[1].astype(np.float32),
            "outputs": Y_list[1].astype(np.float32),
            "n_samples_list": n_lists[1],
        },
    }

    model = VariationalGPSA(
        data_dict,
        m_X_per_view=M_X_PER_VIEW,
        m_G=M_G,
        n_latent_gps={"expression": 5, "histology": None},
        n_noise_variance_params=3,
        fixed_view_idx=0,
        seed=seed,
    )
    vi, Ns, Ps, n_total = model.create_view_idx_dict(data_dict)
    assert n_total == N_VIEWS * (n_expr + n_hist)

    t0 = time.time()
    losses = model.fit(n_epochs=n_epochs, lr=1e-2, S=5, print_every=500)
    dt = time.time() - t0

    X_spatial = {m: data_dict[m]["spatial_coords"] for m in data_dict}
    G_means, _, _, _ = model.forward(X_spatial, vi, Ns)

    def err(mod, n_per):
        a = G_means[mod]
        return float(np.mean(np.sum((a[:n_per] - a[n_per:]) ** 2, axis=1)))

    def pre_err(mod, n_per):
        x = data_dict[mod]["spatial_coords"]
        return float(np.mean(np.sum((x[:n_per] - x[n_per:]) ** 2, axis=1)))

    out = {
        "expression": {"pre": pre_err("expression", n_expr), "post": err("expression", n_expr)},
        "histology": {"pre": pre_err("histology", n_hist), "post": err("histology", n_hist)},
        "final_loss": float(losses[-1]),
        "seconds": dt,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "multimodal_alignment.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
