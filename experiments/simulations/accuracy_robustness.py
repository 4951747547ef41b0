"""Multi-seed robustness of the converged-accuracy recipe.

Runs the de-novo and template-based alignments at 10k epochs with the
converged-accuracy recipe (temperature-0 warp + cosine lr decay) across many
independent data draws, and reports the error distribution next to the
reference's recorded single-draw oracles
(/root/reference/experiments/simulations/two_dimensional_denovo_vs_templatebased.py:234-236)
and its measured converged range (0.0049-0.0078, experiments/out/
parity_trajectory.json).

Run: python experiments/simulations/accuracy_robustness.py --seeds 10
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu.data import generate_twod_data
from two_dimensional_denovo_vs_templatebased import two_d_gpsa, view_error


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--restarts", type=int, default=1,
                    help=">1 = multi-start via fit_multistart")
    ap.add_argument("--select", default="loss",
                    choices=["loss", "consistency", "predictive", "auto"],
                    help="restart-selection criterion (fit_multistart)")
    ap.add_argument("--ensemble-top-k", type=int, default=1,
                    help="average aligned coords over the top-k restarts "
                    "(consistency selection only)")
    ap.add_argument("--adaptive-waves", type=int, default=None,
                    help="adaptive restart waves of this size; --restarts "
                    "becomes the cap (fit_multistart adaptive_waves)")
    ap.add_argument("--init", default="random",
                    choices=["random", "prealign", "ot", "mixed"],
                    help="restart init-diversity family (fit_multistart init)")
    ap.add_argument("--wave-size", type=int, default=None,
                    help="fixed vectorized wave width (all waves run; bounds "
                    "the compiled program width — fit_multistart wave_size)")
    ap.add_argument("--precision", default="auto",
                    help="svgp_matmul_precision (e.g. 'highest' for the "
                    "max-accuracy f32 recipe, docs/PERF.md)")
    ap.add_argument("--seed-list", default=None,
                    help="comma-separated explicit seeds (overrides --seeds); "
                    "for targeted tail-seed reruns")
    ap.add_argument("--modes", default="denovo,template",
                    help="comma-separated subset of {denovo,template}")
    ap.add_argument("--tag", default=None,
                    help="suffix for the output artifact name")
    args = ap.parse_args()

    seeds = (
        [int(s) for s in args.seed_list.split(",")]
        if args.seed_list else list(range(args.seeds))
    )
    mode_pairs = [
        (m, {"denovo": None, "template": 0}[m])
        for m in args.modes.split(",")
    ]

    rows = []
    for seed in seeds:
        rng = np.random.default_rng(seed)
        X, Y, nsl, view_idx = generate_twod_data(
            2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
            kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
        )
        obs = view_error(X, view_idx)
        row = {"seed": seed, "observed_error": obs}
        for mode, fixed in mode_pairs:
            import time as _time
            t0 = _time.time()
            aligned = two_d_gpsa(
                X, Y, nsl, args.epochs, {"expression": 5},
                fixed_view_idx=fixed, seed=seed, recipe="accurate",
                n_restarts=args.restarts, select=args.select,
                ensemble_top_k=args.ensemble_top_k,
                adaptive_waves=args.adaptive_waves, init=args.init,
                wave_size=args.wave_size, precision=args.precision,
            )
            row[f"{mode}_error"] = view_error(aligned, view_idx)
            row[f"{mode}_seconds"] = _time.time() - t0
        print(json.dumps(row), flush=True)
        rows.append(row)

    def stats(key):
        v = np.array([r[key] for r in rows if key in r])
        if v.size == 0:
            return None
        return {
            "mean": float(v.mean()), "median": float(np.median(v)),
            "min": float(v.min()), "max": float(v.max()),
        }

    out = {
        "recipe": "accurate",
        "n_epochs": args.epochs,
        "seeds": seeds,
        "n_restarts": args.restarts,
        "select": args.select,
        "ensemble_top_k": args.ensemble_top_k,
        "adaptive_waves": args.adaptive_waves,
        "init": args.init,
        "wave_size": args.wave_size,
        "precision": args.precision,
        "denovo": stats("denovo_error"),
        "denovo_seconds": stats("denovo_seconds"),
        "template_seconds": stats("template_seconds"),
        "template": stats("template_error"),
        "observed": stats("observed_error"),
        "reference": {
            "recorded_oracle_denovo": 0.000536963,
            "recorded_oracle_template": 0.007253051,
            "measured_converged_denovo_range": [0.0049, 0.0078],
        },
        "rows": rows,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    name = "accuracy_robustness" + (
        f"_restarts{args.restarts}" if args.restarts > 1 else ""
    )
    if args.select != "loss":
        name += f"_{args.select}"
    if args.adaptive_waves:
        name += f"_adaptive{args.adaptive_waves}"
    if args.init != "random":
        name += f"_init_{args.init}"
    if args.precision != "auto":
        name += f"_prec_{args.precision}"
    if args.tag:
        name += f"_{args.tag}"
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in ("denovo", "template", "observed")}, indent=2))


if __name__ == "__main__":
    main()
