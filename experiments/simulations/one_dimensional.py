"""1-D alignment with grid-initialized inducing points.

Port of the reference's 1-D simulation pattern
(/root/reference/experiments/simulations/one_dimensional.py and
one_dimensional_prediction.py:115 — which uses grid_init=True).

Run: python experiments/simulations/one_dimensional.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_oned_data_gp_warp

N_EPOCHS = 3000


def main(seed=0, n_epochs=N_EPOCHS):
    rng = np.random.default_rng(seed)
    X, Y, n_samples_list, view_idx = generate_oned_data_gp_warp(
        n_views=2,
        n_outputs=4,
        n_samples_per_view=80,
        n_latent_gps=2,
        kernel_variance=0.25,
        kernel_lengthscale=5.0,
        noise_variance=1e-3,
        rng=rng,
    )
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    data_dict = {
        "expression": {
            "spatial_coords": X,
            "outputs": Y,
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=20,
        m_G=20,
        n_latent_gps={"expression": 2},
        fixed_view_idx=0,
        seed=seed,
    )
    assert model.n_spatial_dims == 1
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=n_epochs, lr=1e-2, S=5, print_every=500)
    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    a = G_means["expression"]
    pre = float(np.mean((X[view_idx[0]] - X[view_idx[1]]) ** 2))
    post = float(np.mean((a[view_idx[0]] - a[view_idx[1]]) ** 2))
    out = {"pre_error": pre, "post_error": post, "final_loss": float(losses[-1])}
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "one_dimensional.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
