"""Synthetic-warp recovery on (real or stand-in) expression data.

Port of /root/reference/experiments/expression/st/
st_alignment_synthetic_warp.py and ..._numgenes.py / ..._multiple_types.py:
take one real slice, duplicate it, apply a KNOWN warp (gp / linear / polar),
then measure how well alignment recovers it — including a sweep over the
number of genes used.

Run: python experiments/expression/st/st_alignment_synthetic_warp.py \
        [--warp gp|linear|polar] [--n-genes-sweep 5 10 20]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import (
    apply_gp_warp,
    apply_linear_warp,
    apply_polar_warp,
    load_st_data,
    synthetic_st_like,
)

WARPS = {"gp": apply_gp_warp, "linear": apply_linear_warp, "polar": apply_polar_warp}


def run_once(X0, Y0, warp, n_genes, epochs, seed):
    rng = np.random.default_rng(seed)
    Yg = Y0[:, :n_genes]
    if warp == "gp":
        X, Y, nsl, vi = apply_gp_warp(
            X0, Yg, 2, kernel_variance=0.25, kernel_lengthscale=5.0,
            noise_variance=1e-3, rng=rng,
        )
    elif warp == "linear":
        X, Y, nsl, vi = apply_linear_warp(
            X0, Yg, 2, linear_slope_variance=0.1, linear_intercept_variance=0.1,
            noise_variance=1e-3, rng=rng,
        )
    else:
        X, Y, nsl, vi = apply_polar_warp(
            X0, Yg, 2, linear_slope_variance=0.1, noise_variance=1e-3, rng=rng,
        )
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": nsl}}
    model = VariationalGPSA(
        dd, m_X_per_view=40, m_G=40,
        n_latent_gps={"expression": min(5, n_genes)}, fixed_view_idx=0, seed=seed,
    )
    vi_d, Ns, _, _ = model.create_view_idx_dict(dd)
    losses = model.fit(n_epochs=epochs, lr=1e-2, S=5)
    G, _, _, _ = model.forward({"expression": X}, vi_d, Ns)
    err = lambda c: float(np.mean(np.sum((c[vi[0]] - c[vi[1]]) ** 2, axis=1)))
    return {"n_genes": n_genes, "pre": err(X), "post": err(G["expression"]),
            "loss": float(losses[-1])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None, help="one real ST slice CSV")
    ap.add_argument("--warp", choices=list(WARPS), default="gp")
    ap.add_argument("--n-genes-sweep", type=int, nargs="+", default=[5, 20])
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.csv:
        coords, counts, _ = load_st_data([args.csv], n_genes=max(args.n_genes_sweep))
        X0, Y0 = coords[0], np.log1p(counts[0])
    else:
        coords, counts = synthetic_st_like(n_slices=1, grid_size=10,
                                           n_genes=max(args.n_genes_sweep),
                                           seed=args.seed)
        X0, Y0 = coords[0], counts[0]
    Y0 = (Y0 - Y0.mean(0)) / (Y0.std(0) + 1e-8)

    rows = [
        run_once(X0, Y0, args.warp, g, args.epochs, args.seed)
        for g in args.n_genes_sweep
    ]
    for r in rows:
        print(r, flush=True)
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"synthetic_warp_{args.warp}.json"), "w") as f:
        json.dump({"warp": args.warp, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
