"""Accuracy/throughput A/B for the variance-term-only MXU precision knob.

The m=200 real-data op profile attributes ~27% of device step time to the
two variance-projection fusions (the O(S L N m^2) diag quadratic forms in
svgp_mean_var; op_profile_visium.json). Those products only feed sigma
through sums of squares — the predictive MEAN is computed separately — so
``svgp_variance_precision="default"`` (1-pass bf16 MXU, ~3x fewer passes
than the "high" default the mean keeps) is a candidate throughput win whose
only risk is variance-term rounding (the cancellation-sensitive part,
kff - aKa, is floored by the double diagonal_offset and _VAR_FLOOR).

Protocol mirrors precision_convergence_ab.py, with the multistart lesson
from precision_convergence_ab_restarts.json baked in: single-restart
converged errors are basin lottery draws, so each precision arm trains R
independent inits and arms are compared on best-of-R / median-of-R.

Arms: svgp_variance_precision in ("follow", "default") under the library's
auto matmul precision ("high" at this scale).

Run: python experiments/simulations/variance_precision_ab.py
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
        for vp in ("follow", "default"):
            model = VariationalGPSA(
                dd, m_X_per_view=args.m, m_G=args.m,
                n_latent_gps={"expression": 10}, fixed_view_idx=0,
                seed=seed, svgp_variance_precision=vp,
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
                print(json.dumps({"seed": seed, "vp": vp, "restart": r,
                                  **restarts[-1]}), flush=True)
            errs = [r["aligned_error"] for r in restarts]
            row[vp] = {
                "restarts": restarts,
                "best_error": float(np.min(errs)),
                "median_error": float(np.median(errs)),
                # warm-run rate: restart 0 pays compiles
                "steps_per_sec": float(np.median(
                    [r["steps_per_sec"] for r in restarts[1:]] or
                    [restarts[0]["steps_per_sec"]])),
                "all_finite": bool(all(r["finite"] for r in restarts)),
            }
        row["best_ratio_default_over_follow"] = (
            row["default"]["best_error"] / row["follow"]["best_error"])
        row["median_ratio_default_over_follow"] = (
            row["default"]["median_error"] / row["follow"]["median_error"])
        row["speedup_default_over_follow"] = (
            row["default"]["steps_per_sec"] / row["follow"]["steps_per_sec"])
        rows.append(row)
        print(json.dumps({k: v for k, v in row.items()
                          if k in ("seed", "best_ratio_default_over_follow",
                                   "median_ratio_default_over_follow",
                                   "speedup_default_over_follow")}),
              flush=True)

    out = {
        "config": vars(args),
        "arms": "svgp_variance_precision follow (= auto matmul 'high' at "
                "this scale) vs 'default' (1-pass bf16 variance terms)",
        "rows": rows,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "variance_precision_ab.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
