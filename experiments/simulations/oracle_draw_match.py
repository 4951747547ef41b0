"""De-novo accuracy on data draws difficulty-matched to the reference oracle.

The reference's recorded de-novo oracle (0.000536963, source comment at
/root/reference/experiments/simulations/two_dimensional_denovo_vs_templatebased.py:234)
comes from ONE data draw whose pre-alignment observed error was 0.733. Draw
difficulty dominates the converged error (seeds 0/1/2 here span observed
0.81-3.12), so comparing a random draw against that oracle conflates recipe
quality with draw luck. This harness scans seeds for draws whose observed
error is closest to the oracle's, then trains the converged-accuracy recipe
(temperature-0 warp + cosine lr decay) de-novo on the closest ones.

Run: python experiments/simulations/oracle_draw_match.py --n-match 3
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu.data import generate_twod_data
from two_dimensional_denovo_vs_templatebased import two_d_gpsa, view_error

ORACLE_OBSERVED = 0.7329880727046506
ORACLE_DENOVO = 0.000536963


def draw(seed):
    rng = np.random.default_rng(seed)
    X, Y, n_samples_list, view_idx = generate_twod_data(
        2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    return X, Y, n_samples_list, view_idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=40, help="seeds to scan")
    ap.add_argument("--n-match", type=int, default=3, help="closest draws to train")
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--restarts", type=int, default=1,
                    help="restarts per draw (fit_multistart)")
    ap.add_argument("--select",
                    choices=["loss", "predictive", "consistency", "auto"],
                    default="loss",
                    help="restart selection criterion (see "
                    "fit_multistart; 'consistency' is the "
                    "alignment-correlated winner of "
                    "experiments/out/restart_selection_ab.json)")
    ap.add_argument("--ensemble-top-k", type=int, default=1,
                    help="average aligned coords over the top-k restarts "
                    "(consistency selection only)")
    args = ap.parse_args()

    scanned = []
    for seed in range(args.scan):
        X, _, _, view_idx = draw(seed)
        obs = view_error(X, view_idx)
        scanned.append((abs(obs - ORACLE_OBSERVED), obs, seed))
    scanned.sort()
    print("closest draws to the oracle's observed error 0.733:")
    for gap, obs, seed in scanned[: args.n_match]:
        print(f"  seed {seed}: observed {obs:.4f}")

    results = []
    for _, obs, seed in scanned[: args.n_match]:
        X, Y, n_samples_list, view_idx = draw(seed)
        aligned = two_d_gpsa(
            X, Y, n_samples_list, args.epochs, {"expression": 5},
            fixed_view_idx=None, seed=seed, recipe="accurate",
            n_restarts=args.restarts, select=args.select,
            ensemble_top_k=args.ensemble_top_k,
        )
        err = view_error(aligned, view_idx)
        print(f"seed {seed}: observed {obs:.4f} -> denovo {err:.6f}")
        results.append({"seed": seed, "observed_error": obs, "denovo_error": err})

    out = {
        "oracle": {"observed_error": ORACLE_OBSERVED, "denovo_error": ORACLE_DENOVO},
        "recipe": "accurate",
        "n_epochs": args.epochs,
        "n_restarts": args.restarts,
        "select": args.select,
        "ensemble_top_k": args.ensemble_top_k,
        "matched_draws": results,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "oracle_draw_match.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
