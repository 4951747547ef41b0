"""Shared machinery for the simulation experiment scripts."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "out")


def fit_and_align(
    X,
    Y,
    n_samples_list,
    *,
    m=25,
    n_latent_gps=None,
    n_epochs=2000,
    lr=1e-2,
    S=5,
    fixed_view_idx=0,
    seed=0,
    **model_kwargs,
):
    """Train a VariationalGPSA and return (aligned_coords, final_loss)."""
    X = np.asarray(X, np.float32)
    Y = np.asarray(Y, np.float32)
    data_dict = {
        "expression": {
            "spatial_coords": X,
            "outputs": Y,
            "n_samples_list": list(n_samples_list),
        }
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=m,
        m_G=m,
        n_latent_gps={"expression": n_latent_gps},
        fixed_view_idx=fixed_view_idx,
        seed=seed,
        **model_kwargs,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=n_epochs, lr=lr, S=S)
    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    return G_means["expression"], float(losses[-1])


def view_error(coords, view_idx_a, view_idx_b):
    """Mean over matched spots of the summed squared coordinate difference."""
    return float(
        np.mean(np.sum((coords[view_idx_a] - coords[view_idx_b]) ** 2, axis=1))
    )


def write_result(name, payload):
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, name), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
