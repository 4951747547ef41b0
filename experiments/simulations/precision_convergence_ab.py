"""Convergence-level accuracy gate for the auto bf16 projection precision.

build_spec resolves svgp_matmul_precision="auto" to "high" (bf16 3-pass MXU
for the O(m^2 N) projection matmuls) at >= 2000 total points — a measured
1.21x at the m=200 / N=4k real-data config (experiments/out/
step_profile.json). Step-level ELBO parity was already pinned
(tests/test_model_core.py:test_svgp_matmul_precision_knob); this harness
gates the DEFAULT flip at convergence level: train the real-data-scale
config under both precisions to convergence and compare aligned-view error.

Run: python experiments/simulations/precision_convergence_ab.py
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
    ap.add_argument("--restarts", type=int, default=1,
                    help=">1 = train this many independent inits per "
                    "precision arm (basin-vs-systematic diagnosis: if "
                    "best-of-R f32 matches best-of-R bf16, the single-"
                    "restart deficit was trajectory luck, not numerics)")
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
        for prec in ("highest", "high"):
            model = VariationalGPSA(
                dd, m_X_per_view=args.m, m_G=args.m,
                n_latent_gps={"expression": 10}, fixed_view_idx=0,
                seed=seed, svgp_matmul_precision=prec,
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
                }

            if args.restarts == 1:
                row[prec] = one_run()
            else:
                restarts = []
                for r in range(args.restarts):
                    model.reinitialize(1000 * seed + r)
                    restarts.append(one_run())
                    print(json.dumps({"seed": seed, "prec": prec, "r": r,
                                      **restarts[-1]}), flush=True)
                errs = [x["aligned_error"] for x in restarts]
                row[prec] = {
                    "restarts": restarts,
                    "best_error": float(np.min(errs)),
                    "median_error": float(np.median(errs)),
                    "worst_error": float(np.max(errs)),
                    "best_tail_loss": float(np.min(
                        [x["tail_loss"] for x in restarts])),
                }
        if args.restarts == 1:
            row["error_ratio_high_over_highest"] = (
                row["high"]["aligned_error"] / row["highest"]["aligned_error"]
            )
        else:
            row["best_ratio_high_over_highest"] = (
                row["high"]["best_error"] / row["highest"]["best_error"]
            )
            row["median_ratio_high_over_highest"] = (
                row["high"]["median_error"] / row["highest"]["median_error"]
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    ratio_key = ("error_ratio_high_over_highest" if args.restarts == 1
                 else "best_ratio_high_over_highest")
    ratios = [r[ratio_key] for r in rows]
    out = {
        "config": f"2-view {args.grid_size}x{args.grid_size} grids, m={args.m}, "
                  "S=5, L=10, template view 0",
        "epochs": args.epochs,
        "restarts": args.restarts,
        "rows": rows,
        f"median_{ratio_key}": float(np.median(ratios)),
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    name = ("precision_convergence_ab.json" if args.restarts == 1
            else "precision_convergence_ab_restarts.json")
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({f"median_{ratio_key}": out[f"median_{ratio_key}"]},
                     indent=2))


if __name__ == "__main__":
    main()
