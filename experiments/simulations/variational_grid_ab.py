"""Variational-parameterization A/B over the full mode/recipe grid.

Round-2 left a split brain (VERDICT r2 "what's weak" #5): the triangular
(GPflow q_sqrt) parameterization is ~1.5x faster and better on the bench
config, but the temperature-0 "accurate" recipe in TEMPLATE mode converged
badly under it (0.27 vs 0.005 aligned error), so the library default stayed
square — neither the fastest nor the most accurate. The whitened
parameterization (spec.whitened_variational; q expressed relative to the
current prior, w = L^-1 (u - mu_z)) is the principled candidate fix: the
posterior moves WITH the learned inducing points / kernel hyperparameters
instead of chasing them, the KL has no Kuu term, and the predictive costs
one triangular solve instead of two.

This harness trains {square, triangular, whitened} x {denovo, template} x
{plain, accurate-recipe} on difficulty-matched draws and records aligned
error + tail loss + steps/s, writing experiments/out/variational_grid_ab.json.
The decision rule (VERDICT r2 next-round item 4): the shipped default must be
best-or-tied across the 2x2 grid.

Run: python experiments/simulations/variational_grid_ab.py --seeds 35 30
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data

PARAMS = ("square", "triangular", "whitened")


def draw(seed):
    rng = np.random.default_rng(seed)
    return generate_twod_data(
        2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )


def view_error(coords, view_idx):
    return float(
        np.mean(np.sum((coords[view_idx[0]] - coords[view_idx[1]]) ** 2, axis=1))
    )


def run_cell(X, Y, nsl, view_idx, parameterization, template, recipe, epochs, seed):
    data_dict = {
        "expression": {
            "spatial_coords": X.astype(np.float32),
            "outputs": Y.astype(np.float32),
            "n_samples_list": nsl,
        }
    }
    model = VariationalGPSA(
        data_dict, m_X_per_view=50, m_G=50, n_latent_gps={"expression": 5},
        mean_function="identity_fixed",
        fixed_view_idx=0 if template else None, seed=seed,
        triangular_variational=(parameterization == "triangular"),
        whitened_variational=(parameterization == "whitened"),
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    t0 = time.time()
    losses = model.fit(n_epochs=epochs, lr=1e-2, S=5, recipe=recipe)
    dt = time.time() - t0
    G_means, _, _, _ = model.forward(
        {"expression": X.astype(np.float32)}, vi, Ns
    )
    Ga = np.asarray(G_means["expression"])
    return {
        "aligned_error": view_error(Ga, view_idx),
        "tail_loss": float(np.mean(losses[-200:])),
        "seconds": dt,
        "steps_per_sec": epochs / dt,
        "finite": bool(np.isfinite(losses).all()),
    }


def main():
    global PARAMS
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[35, 30])
    ap.add_argument("--epochs-plain", type=int, default=5000)
    ap.add_argument("--epochs-accurate", type=int, default=10000)
    ap.add_argument("--params", nargs="+", default=list(PARAMS),
                    choices=list(PARAMS))
    ap.add_argument("--out-name", default="variational_grid_ab.json")
    args = ap.parse_args()
    PARAMS = tuple(args.params)

    rows = []
    for seed in args.seeds:
        X, Y, nsl, view_idx = draw(seed)
        obs = view_error(X, view_idx)
        for template in (False, True):
            for recipe in ("plain", "accurate"):
                epochs = (
                    args.epochs_accurate if recipe == "accurate"
                    else args.epochs_plain
                )
                for p in PARAMS:
                    r = run_cell(
                        X, Y, nsl, view_idx, p, template, recipe, epochs, seed
                    )
                    r.update(seed=seed, parameterization=p,
                             mode="template" if template else "denovo",
                             recipe=recipe, observed_error=obs)
                    rows.append(r)
                    print(json.dumps(r), flush=True)

    # medians per (mode, recipe, parameterization) cell
    summary = {}
    for mode in ("denovo", "template"):
        for recipe in ("plain", "accurate"):
            cell = {}
            for p in PARAMS:
                errs = [r["aligned_error"] for r in rows
                        if r["mode"] == mode and r["recipe"] == recipe
                        and r["parameterization"] == p]
                cell[p] = float(np.median(errs))
            summary[f"{mode}/{recipe}"] = cell
    sps = {
        p: float(np.median([r["steps_per_sec"] for r in rows
                            if r["parameterization"] == p]))
        for p in PARAMS
    }

    out = {
        "config": "2-view 10x10 grid, 30 outputs, L=5, m=50, S=5, lr 1e-2",
        "epochs": {"plain": args.epochs_plain,
                   "accurate": args.epochs_accurate},
        "median_aligned_error": summary,
        "median_steps_per_sec": sps,
        "rows": rows,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, args.out_name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"median_aligned_error": summary,
                      "median_steps_per_sec": sps}, indent=2))


if __name__ == "__main__":
    main()
