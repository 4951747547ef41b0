"""Alignment at scale: 50x50 grid (2,500 spots/view).

TPU-native port of the reference harness
(/root/reference/experiments/simulations/simulation_large_numspots.py:25-123):
two views, m = 40 inducing points, 3 outputs, template view 0, 2000 epochs.
Also records steady-state training throughput — at this N the S-batched
cross-Gram dominates and the Pallas path engages on TPU.

Run: python experiments/simulations/simulation_large_numspots.py [--grid-size 50]
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
from spatial_alignment_tpu.utils.ot import entropic_ot_align_views

N_VIEWS = 2
M_G = 40
M_X_PER_VIEW = 40
N_OUTPUTS = 3
FIXED_VIEW_IDX = 0
N_EPOCHS = 2000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid-size", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=N_EPOCHS)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    X, Y, n_samples_list, view_idx = generate_twod_data(
        N_VIEWS,
        N_OUTPUTS,
        grid_size=args.grid_size,
        n_latent_gps=None,
        kernel_lengthscale=5.0,
        kernel_variance=0.1,
        noise_variance=0.0,
        rng=rng,
    )
    print(f"generated {X.shape[0]} spots in {time.time() - t0:.1f}s")
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)

    data_dict = {
        "expression": {
            "spatial_coords": X,
            "outputs": Y,
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=M_X_PER_VIEW,
        m_G=M_G,
        n_latent_gps={"expression": None},
        fixed_view_idx=FIXED_VIEW_IDX,
        seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)

    step, opt_state = model.make_train_step(lr=1e-2, S=5)
    params = model.params
    import jax

    # warmup/compile
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, model._next_key())
    loss.block_until_ready()
    t0 = time.time()
    for t in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, model._next_key())
        if t % 500 == 0:
            print(f"iter {t} loss {float(loss):.1f}", flush=True)
    loss.block_until_ready()
    dt = time.time() - t0
    model.params = params

    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    aligned = G_means["expression"]
    pre = float(np.mean(np.sum((X[view_idx[0]] - X[view_idx[1]]) ** 2, axis=1)))
    post = float(
        np.mean(np.sum((aligned[view_idx[0]] - aligned[view_idx[1]]) ** 2, axis=1))
    )
    # OT baseline (PASTE-style; the reference's comparison column,
    # simulation_large_numspots.py:71-91)
    t0 = time.time()
    X_ot = entropic_ot_align_views(X, Y, view_idx)
    ot_seconds = time.time() - t0
    ot_err = float(
        np.mean(np.sum((X_ot[view_idx[0]] - X_ot[view_idx[1]]) ** 2, axis=1))
    )

    out = {
        "n_spots_total": int(X.shape[0]),
        "ot_baseline_error": ot_err,
        "ot_baseline_seconds": ot_seconds,
        "steps_per_sec": args.epochs / dt,
        "observed_error": pre,
        "aligned_error": post,
        "final_loss": float(loss),
        "epochs": args.epochs,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "large_numspots.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
