"""Convergence-level accuracy gate for the auto SVGP solve mode.

TPU lowers triangular solves to serial block loops
(InvertDiagBlocksLowerTriangular) paid per DISPATCH, so consolidating the
step's solves into one explicit width-m chol(Kuu)^-1 is the throughput
lever (experiments/out/op_profile_visium.json has the attribution at the
m=200 / N=4050 real-data config —
/root/reference/experiments/expression/visium/visium_alignment.py:48-49).

Step-level ELBO parity is pinned at ~1e-6 relative by
tests/test_solve_mode.py and all modes are bit-equal in f64 — but the
explicit inverse's error scales with cond(chol), and the m=200 Gram sits
near the f32 rounding band late in training (the round-3 "loss cliff"
regime), so the default is gated HERE at convergence level: train the
real-data-scale config under each mode through a long horizon (past the
historical epoch-4119 cliff) and compare aligned-view error.

Modes measured:
  solve      — per-use backward-stable triangular solves (baseline);
  kl_inverse — predictive keeps solves; the KL's prior solve reuses the
               factor pass's explicit inverse;
  mixed      — predictive mean via a narrow (width-C) backward-stable
               solve; only the variance quadratic forms apply the explicit
               inverse (no width-N solves anywhere);
  inverse    — the SVGP predictive applies the explicit inverse throughout.

History pinned by this artifact: the first "inverse" implementation used a
matmul-only custom VJP (L_bar = -X^T G X^T with the inexact f32 X); it
converged ~20-70x worse than solve. Replacing it with plain autodiff
through the solve recovered most of that (seed 0: 1.2e-3 -> 7.9e-5), but a
~4x gap to solve remained, traced to the predictive-mean forward path —
hence kl_inverse as the default and inverse as a labeled fast path.

Run: python experiments/simulations/solve_mode_convergence_ab.py
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
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--grid-size", type=int, default=45)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument(
        "--modes", nargs="+",
        default=["solve", "kl_inverse", "mixed", "inverse"],
        help="first mode is the ratio baseline",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "out", "solve_mode_convergence_ab.json"
        ),
    )
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
        for mode in args.modes:
            model = VariationalGPSA(
                dd, m_X_per_view=args.m, m_G=args.m,
                n_latent_gps={"expression": 10}, fixed_view_idx=0,
                seed=seed, svgp_solve_mode=mode,
            )
            t0 = time.time()
            losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5)
            dt = time.time() - t0
            G, _, _ = model.predict({"expression": X})
            g = G["expression"]
            err = float(np.mean(np.sum(
                (g[view_idx[0]] - g[view_idx[1]]) ** 2, axis=1)))
            row[mode] = {
                "aligned_error": err,
                "tail_loss": float(np.mean(losses[-200:])),
                "all_finite": bool(np.all(np.isfinite(losses))),
                "steps_per_sec": args.epochs / dt,
            }
        base = args.modes[0]
        for mode in args.modes[1:]:
            row[f"error_ratio_{mode}_over_{base}"] = (
                row[mode]["aligned_error"] / row[base]["aligned_error"]
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = args.modes[0]
    med = {
        mode: float(np.median([r[f"error_ratio_{mode}_over_{base}"] for r in rows]))
        for mode in args.modes[1:]
    }
    out = {
        "config": f"2-view {args.grid_size}x{args.grid_size} grids, m={args.m}, "
                  "S=5, L=10, template view 0, plain Adam lr=1e-2 "
                  "(the historical cliff regime)",
        "epochs": args.epochs,
        "rows": rows,
        "median_error_ratio_vs_solve": med,
        "note": (
            "Matched-seed converged aligned-view error, inverse vs solve. "
            "Snapshot losses at matched step counts differ (chaotic early "
            "trajectories amplify the ~1e-6 per-step difference, same story "
            "as pallas_ab.json); the converged error is the quality signal."
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"median_error_ratio_vs_solve": med}, indent=2))


if __name__ == "__main__":
    main()
