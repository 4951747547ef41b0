"""LMC latent-component maps after joint Visium alignment.

Port of /root/reference/experiments/expression/visium/
visium_component_analysis.py: fit GPSA with a small number of latent GPs
(L=5) on the two slices, then visualize each latent component's posterior
mean spatially per view (2 x L panel grid) plus the final aligned scatter.
The components are the low-dimensional spatial factors the LMC mixes into
genes.

Run: python experiments/expression/visium/visium_component_analysis.py
     [--h5ad s1.h5ad s2.h5ad] [--epochs 3000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import load_h5ad, synthetic_visium_like

N_COMPONENTS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5ad", nargs=2, default=None)
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--m", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.h5ad:
        slices = [load_h5ad(p) for p in args.h5ad]
        coords = [s["spatial"].astype(float) for s in slices]
        counts = [np.asarray(s["X"], float) for s in slices]
    else:
        coords, counts = synthetic_visium_like(n_spots=600, n_genes=30, seed=args.seed)

    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    Y_all = np.concatenate(counts)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts = [(y - mu) / sd for y in counts]

    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(counts).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]

    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}}
    model = VariationalGPSA(
        dd,
        m_X_per_view=args.m,
        m_G=args.m,
        n_latent_gps={"expression": N_COMPONENTS},
        fixed_warp_kernel_variances=np.ones(2),
        fixed_warp_kernel_lengthscales=np.full(2, 10.0),
        seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5, print_every=500)

    G_means, _, F_latent, _ = model.forward({"expression": X}, vi, Ns, S=10)
    comps = np.asarray(F_latent["expression"]).mean(axis=0)  # (N, L)
    aligned = np.asarray(G_means["expression"])

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(os.path.join(out_dir, "latent_components_visium.csv"), comps, delimiter=",")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, N_COMPONENTS, figsize=(3 * N_COMPONENTS, 6))
    for vv in range(2):
        idx = vi["expression"][vv]
        for ll in range(N_COMPONENTS):
            ax = axes[vv, ll]
            ax.scatter(X[idx, 0], X[idx, 1], c=comps[idx, ll], s=8, marker="H")
            ax.set_axis_off()
            if vv == 0:
                ax.set_title(f"Component {ll + 1}")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "visium_lowd_components.png"))
    plt.close()

    plt.figure(figsize=(10, 5))
    for panel, (c, title) in enumerate(
        [(X, "Observed data"), (aligned, "Aligned data, GPSA")]
    ):
        plt.subplot(1, 2, panel + 1)
        for vv in range(2):
            idx = vi["expression"][vv]
            plt.scatter(c[idx, 0], c[idx, 1], s=6, alpha=0.6, label=f"view {vv}")
        plt.title(title)
        plt.axis("off")
    plt.legend()
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "visium_component_alignment.png"))
    plt.close()

    # component spatial coherence summary
    from spatial_alignment_tpu.utils import morans_i

    out = {
        "final_loss": float(losses[-1]),
        "component_morans_i_observed": [float(v) for v in morans_i(X, comps)],
        "component_morans_i_aligned": [float(v) for v in morans_i(aligned, comps)],
    }
    with open(os.path.join(out_dir, "component_analysis.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
