"""Accuracy/throughput A/B: triangular variational parameterization AT SCALE.

VERDICT r4 item 1 names fusing the factor->solve->project chain as the
remaining m=200 perf lever — but the cheapest way to delete factorization
work is to not do it: ``triangular_variational=True`` stores every
variational covariance factor as a lower-triangular Cholesky directly, so
the 11 Omega lanes of the m=200 step's (14, 200, 200) factor slab (and
their Murray pullbacks in the backward pass — op_profile_visium.json
attributes the InvertDiagBlocks custom call at ~9% of device time largely
to those) vanish; only the 3 Kuu lanes remain.

Square stayed the LIBRARY default on the small-m accuracy grid
(variational_grid_ab.json: square wins denovo/accurate at m=50 and is
never catastrophic). This script measures the m=200/N=4050 regime that
grid never probed, with the multistart protocol from
precision_convergence_ab_restarts.json (single-restart converged errors
are basin lottery draws — compare best-of-R / median-of-R).

Arms: triangular_variational in (False, True), shipped auto defaults
otherwise.

Run: python experiments/simulations/triangular_scale_ab.py
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--grid-size", type=int, default=45)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--out", default="triangular_scale_ab.json")
    args = ap.parse_args()

    rows = []
    for seed in args.seeds:
        rng = np.random.default_rng(seed)
        X, Y, nsl, view_idx = generate_twod_data(
            2, 30, grid_size=args.grid_size, n_latent_gps=10,
            kernel_lengthscale=5.0, kernel_variance=0.5,
            noise_variance=0.001, fixed_view_idx=0, rng=rng,
        )
        X = X.astype(np.float32)
        Y = Y.astype(np.float32)
        dd = {"expression": {"spatial_coords": X, "outputs": Y,
                             "n_samples_list": nsl}}
        row = {"seed": seed, "n_spots": int(X.shape[0])}
        for tri in (False, True):
            key = "triangular" if tri else "square"
            model = VariationalGPSA(
                dd, m_X_per_view=args.m, m_G=args.m,
                n_latent_gps={"expression": 10}, fixed_view_idx=0,
                seed=seed, triangular_variational=tri,
            )

            def one_run():
                t0 = time.time()
                losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5)
                dt = time.time() - t0
                G, _, _ = model.predict({"expression": X})
                g = G["expression"]
                err = float(np.mean(np.sum(
                    (g[view_idx[0]] - g[view_idx[1]]) ** 2, axis=1)))
                return {
                    "aligned_error": err,
                    "tail_loss": float(np.mean(losses[-200:])),
                    "steps_per_sec": args.epochs / dt,
                    "finite": bool(np.all(np.isfinite(losses))),
                }

            restarts = []
            for r in range(args.restarts):
                model.reinitialize(1000 * seed + r)
                restarts.append(one_run())
                print(json.dumps({"seed": seed, "arm": key, "restart": r,
                                  **restarts[-1]}), flush=True)
            errs = [r["aligned_error"] for r in restarts]
            row[key] = {
                "restarts": restarts,
                "best_error": float(np.min(errs)),
                "median_error": float(np.median(errs)),
                "steps_per_sec": float(np.median(
                    [r["steps_per_sec"] for r in restarts[1:]] or
                    [restarts[0]["steps_per_sec"]])),
                "all_finite": bool(all(r["finite"] for r in restarts)),
            }
        row["best_ratio_tri_over_square"] = (
            row["triangular"]["best_error"] / row["square"]["best_error"])
        row["median_ratio_tri_over_square"] = (
            row["triangular"]["median_error"] / row["square"]["median_error"])
        row["speedup_tri_over_square"] = (
            row["triangular"]["steps_per_sec"] / row["square"]["steps_per_sec"])
        rows.append(row)
        print(json.dumps({k: v for k, v in row.items()
                          if k in ("seed", "best_ratio_tri_over_square",
                                   "median_ratio_tri_over_square",
                                   "speedup_tri_over_square")}),
              flush=True)

    out = {
        "config": vars(args),
        "arms": "triangular_variational False (square, library default) vs "
                "True (tril q_sqrt: no per-step Omega factorizations)",
        "rows": rows,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, args.out), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
