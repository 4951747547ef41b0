"""Localize the late-training NaN at the m=200 / N=4k config.

The 10k-epoch precision A/B (precision_convergence_ab.json) NaN'd in 3 of 6
arms while every 4k-epoch run converged cleanly — a long-horizon stability
bug at the real-data scale. This harness reruns a failing arm with a
per-interval callback that records the first non-finite epoch and a parameter
health snapshot (log-param extrema, Kuu conditioning, warp drift) just before
it, so the failure can be attributed to a specific mechanism rather than
guessed at.

Run: python experiments/simulations/nan_diagnose.py --seed 1 --prec high
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data


def param_stats(model):
    """Finite-ness and magnitude summary of every parameter leaf."""
    import jax

    out = {}
    flat = jax.tree_util.tree_flatten_with_path(model.params)[0]
    for path, leaf in flat:
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        arr = np.asarray(leaf, dtype=np.float64)
        out[name] = {
            "min": float(np.nanmin(arr)) if arr.size else 0.0,
            "max": float(np.nanmax(arr)) if arr.size else 0.0,
            "absmax": float(np.nanmax(np.abs(arr))) if arr.size else 0.0,
            "n_nonfinite": int(np.size(arr) - np.isfinite(arr).sum()),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--prec", default="high")
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--interval", type=int, default=100)
    ap.add_argument("--window-start", type=int, default=0,
                    help="record param stats + rolling checkpoint from here")
    ap.add_argument("--grid-size", type=int, default=45)
    ap.add_argument("--m", type=int, default=200)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 30, grid_size=args.grid_size, n_latent_gps=10,
        kernel_lengthscale=5.0, kernel_variance=0.5,
        noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}

    model = VariationalGPSA(
        dd, m_X_per_view=args.m, m_G=args.m,
        n_latent_gps={"expression": 10}, fixed_view_idx=0,
        seed=args.seed, svgp_matmul_precision=args.prec,
    )

    record = {"first_nonfinite_epoch": None, "snapshots": []}
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    ckpt_base = os.path.join(out_dir, f"nan_diag_s{args.seed}_{args.prec}")

    def cb(m, epoch, losses):
        tail = np.asarray(losses[max(0, epoch - args.interval):])
        bad = ~np.isfinite(tail)
        snap = {"epoch": int(epoch), "loss": float(tail[-1])}
        if bad.any() and record["first_nonfinite_epoch"] is None:
            first = int(epoch - len(tail) + 1 + np.argmax(bad))
            record["first_nonfinite_epoch"] = first
            snap["params_at_failure"] = param_stats(m)
            print(f"FIRST NON-FINITE LOSS at epoch {first}", flush=True)
        if args.window_start <= epoch and record["first_nonfinite_epoch"] is None:
            snap["stats"] = param_stats(m)
            # Rolling checkpoint of the last finite state for offline analysis.
            m.save(ckpt_base + "_lastfinite.npz")
        record["snapshots"].append(snap)
        print(json.dumps({"epoch": int(epoch), "loss": snap["loss"]}), flush=True)

    model.fit(n_epochs=args.epochs, lr=1e-2, S=5,
              print_every=args.interval, callback=cb)

    # Health snapshot at the end (or of the last finite state).
    record["final_params"] = param_stats(model)
    path = os.path.join(out_dir, f"nan_diagnose_s{args.seed}_{args.prec}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
