"""Per-train-step wall-clock at the Visium configuration (m = 200).

Port of /root/reference/experiments/expression/visium/
visium_wallclock_time.py:266-271: report per-step seconds for the two-slice
m=200 config. Prints both per-dispatch (scanned chunk / chunk size) and the
steady-state steps/sec.

Run: python experiments/expression/visium/visium_wallclock_time.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import synthetic_visium_like


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-spots", type=int, default=2000)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--variational", choices=["square", "triangular"], default="square",
        help="variational covariance parameterization (triangular = "
        "factorization-free fast path)",
    )
    ap.add_argument(
        "--analytic", action="store_true",
        help="closed-form data-layer expected log-likelihood",
    )
    ap.add_argument(
        "--minibatch", type=int, default=None,
        help="SVI minibatch size per view (unbiased subsampled ELBO)",
    )
    args = ap.parse_args()

    coords, counts = synthetic_visium_like(n_spots=args.n_spots, n_genes=10, seed=args.seed)
    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(counts).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]
    data_dict = {
        "expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}
    }
    model = VariationalGPSA(
        data_dict, m_X_per_view=args.m, m_G=args.m,
        n_latent_gps={"expression": None}, fixed_view_idx=0, seed=args.seed,
        triangular_variational=(args.variational == "triangular"),
        analytic_data_likelihood=args.analytic,
    )
    loop, opt_state = model.make_train_loop(lr=1e-2, S=5, minibatch_size=args.minibatch)
    carry = (model.params, opt_state, jax.random.PRNGKey(0))
    chunk = 100
    t0 = time.time()
    carry, losses = loop(carry, chunk)  # compile + first chunk
    losses.block_until_ready()
    compile_s = time.time() - t0

    t0 = time.time()
    carry, losses = loop(carry, chunk)  # steady state (same static chunk -> cached)
    losses.block_until_ready()
    dt = time.time() - t0

    out = {
        "n_spots_total": int(X.shape[0]),
        "m": args.m,
        "compile_seconds": compile_s,
        "seconds_per_step": dt / chunk,
        "steps_per_sec": chunk / dt,
        "platform": jax.devices()[0].platform,
        "variational": args.variational,
        "analytic_data_likelihood": bool(args.analytic),
        "minibatch": args.minibatch,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    suffix = "" if args.variational == "square" and not args.analytic else (
        f"_{args.variational}" + ("_analytic" if args.analytic else "")
    )
    if args.minibatch is not None:
        suffix += f"_mb{args.minibatch}"
    with open(os.path.join(out_dir, f"wallclock{suffix}.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
