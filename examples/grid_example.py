"""Canonical two-view alignment example.

TPU-native equivalent of the reference's canonical user program
(/root/reference/examples/grid_example.py): two views of a synthetic grid,
template-based alignment to view 0, live plots every PRINT_EVERY epochs.

The reference loads examples/synthetic_data.h5ad (200 spots, 2 views, 30
genes); we generate an equivalent dataset with the packaged generator (same
10x10 grid per view, GP-warped second view). Pass --h5ad PATH to use an
AnnData file instead (read via h5py; anndata not required).

Run: python examples/grid_example.py [--epochs 3000] [--no-plot]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spatial_alignment_tpu import VariationalGPSA, rbf_kernel
from spatial_alignment_tpu.data import generate_twod_data

N_SPATIAL_DIMS = 2
N_VIEWS = 2
M_G = 25
M_X_PER_VIEW = 25
N_OUTPUTS = 5
FIXED_VIEW_IDX = 0
N_LATENT_GPS = {"expression": None}
PRINT_EVERY = 100


def load_h5ad(path):
    import h5py

    with h5py.File(path, "r") as f:
        X = np.asarray(f["obsm/spatial"]).astype(np.float32)
        Y = np.asarray(f["X"]).astype(np.float32)
        batch = np.asarray(f["obs/batch"])
    n_samples_list = [int((batch == b).sum()) for b in sorted(set(batch.tolist()))]
    return X, Y, n_samples_list


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--h5ad", type=str, default=None)
    ap.add_argument("--no-plot", action="store_true")
    args = ap.parse_args()

    default_h5ad = os.path.join(os.path.dirname(__file__), "synthetic_data.h5ad")
    if args.h5ad is None and os.path.exists(default_h5ad):
        args.h5ad = default_h5ad  # parity: the reference reads this file
    if args.h5ad:
        X, Y, n_samples_list = load_h5ad(args.h5ad)
    else:
        X, Y, n_samples_list, _ = generate_twod_data(
            n_views=N_VIEWS,
            n_outputs=N_OUTPUTS,
            grid_size=10,
            kernel_variance=0.25,
            kernel_lengthscale=5.0,
            noise_variance=0.001,
            fixed_view_idx=FIXED_VIEW_IDX,
            rng=np.random.default_rng(0),
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
        n_spatial_dims=N_SPATIAL_DIMS,
        m_X_per_view=M_X_PER_VIEW,
        m_G=M_G,
        data_init=True,
        minmax_init=False,
        grid_init=False,
        n_latent_gps=N_LATENT_GPS,
        mean_function="identity_fixed",
        kernel_func_warp=rbf_kernel,
        kernel_func_data=rbf_kernel,
        fixed_view_idx=FIXED_VIEW_IDX,
    )
    view_idx, Ns, _, _ = model.create_view_idx_dict(data_dict)

    if args.no_plot:
        fig = axes = None
    else:
        import matplotlib

        if not os.environ.get("DISPLAY"):
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from spatial_alignment_tpu.plotting import callback_twod

        fig = plt.figure(figsize=(14, 7), facecolor="white", constrained_layout=True)
        axes = (fig.add_subplot(121, frameon=False), fig.add_subplot(122, frameon=False))

    def on_print(model, t, losses):
        print(f"Iter: {t:<10} LL {-losses[-1]:1.3e}", flush=True)
        if fig is None:
            return
        G_means, _, _, _ = model.forward({"expression": X}, view_idx, Ns)
        callback_twod(
            model,
            X,
            Y,
            X_aligned=G_means,
            data_expression_ax=axes[0],
            latent_expression_ax=axes[1],
            s=600,
        )
        fig.savefig(os.path.join(os.path.dirname(__file__), "grid_example_progress.png"))

    losses = model.fit(
        n_epochs=args.epochs, lr=1e-2, S=5, print_every=PRINT_EVERY, callback=None
    )
    print(f"final loss {losses[-1]:.2f}")

    G_means, _, _, _ = model.forward({"expression": X}, view_idx, Ns)
    aligned = G_means["expression"]
    vi = np.asarray(view_idx["expression"][0]), np.asarray(view_idx["expression"][1])
    if len(vi[0]) == len(vi[1]):
        pre = float(np.mean(np.sum((X[vi[0]] - X[vi[1]]) ** 2, axis=1)))
        post = float(np.mean(np.sum((aligned[vi[0]] - aligned[vi[1]]) ** 2, axis=1)))
        print(f"aligned-view error: {pre:.4f} -> {post:.4f}")
    if fig is not None:
        on_print(model, args.epochs, losses)
        print("wrote grid_example_progress.png")
    print("Done!")


if __name__ == "__main__":
    main()
