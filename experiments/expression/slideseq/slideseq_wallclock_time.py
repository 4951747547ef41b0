"""Per-train-step wall-clock at the Slide-seq configuration.

Port of /root/reference/experiments/expression/slideseq/
slideseq_wallclock_time.py: report per-step seconds for the two-puck
Slide-seq config (dense beads, m=100). Prints compile time plus
steady-state steps/sec (the reference prints per-step wall time each epoch;
one fused scanned chunk replaces the Python-loop step here).

Run: python experiments/expression/slideseq/slideseq_wallclock_time.py
     [--n-beads 3000] [--m 100]
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
from spatial_alignment_tpu.data import synthetic_slideseq_like


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-beads", type=int, default=3000)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--minibatch", type=int, default=None,
                    help="SVI minibatch size per view (unbiased subsampled ELBO)")
    args = ap.parse_args()

    coords, counts = synthetic_slideseq_like(
        n_beads=args.n_beads, n_genes=10, seed=args.seed
    )
    coords = [10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords]
    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(counts).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}}
    model = VariationalGPSA(
        dd, m_X_per_view=args.m, m_G=args.m,
        n_latent_gps={"expression": None}, fixed_view_idx=0, seed=args.seed,
    )
    loop, opt_state = model.make_train_loop(lr=1e-2, S=3, minibatch_size=args.minibatch)
    carry = (model.params, opt_state, jax.random.PRNGKey(0))
    chunk = 100
    t0 = time.time()
    carry, losses = loop(carry, chunk)
    losses.block_until_ready()
    compile_s = time.time() - t0

    t0 = time.time()
    carry, losses = loop(carry, chunk)
    losses.block_until_ready()
    dt = time.time() - t0

    out = {
        "n_beads_total": int(X.shape[0]),
        "m": args.m,
        "compile_seconds": compile_s,
        "seconds_per_step": dt / chunk,
        "steps_per_sec": chunk / dt,
        "platform": jax.devices()[0].platform,
        "minibatch": args.minibatch,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    name = "wallclock.json" if args.minibatch is None else f"wallclock_mb{args.minibatch}.json"
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
