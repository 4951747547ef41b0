"""Wall-clock scaling: GPSA-TPU vs the PyTorch reference at N in {64, 500, 1000}.

Port of /root/reference/experiments/simulations/two_dimensional_time_complexity.py:
173-202 (which compared GPSA vs PASTE; PASTE isn't in this image, so the
comparison here is TPU rebuild vs the PyTorch reference run as shipped).
Writes experiments/out/time_experiment_results.csv.

Run: python experiments/simulations/time_complexity.py [--epochs 200]
"""

import argparse
import csv
import json
import os
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data
from spatial_alignment_tpu.utils.ot import entropic_ot_align_views

M = 25
S = 5


def make_data(n_per_view, seed):
    grid_size = int(np.sqrt(n_per_view))
    rng = np.random.default_rng(seed)
    X, Y, n_samples_list, view_idx = generate_twod_data(
        2, 10, grid_size=grid_size, n_latent_gps=None,
        kernel_lengthscale=5.0, kernel_variance=0.1, rng=rng,
    )
    return X.astype(np.float32), Y.astype(np.float32), n_samples_list, view_idx


def time_ours(X, Y, n_samples_list, n_epochs):
    """Times the scanned on-device loop — fit()'s production execution path
    (one dispatch per chunk), not an artificial per-step Python loop."""
    import jax

    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}}
    model = VariationalGPSA(dd, m_X_per_view=M, m_G=M, n_latent_gps={"expression": None})
    loop, opt_state = model.make_train_loop(lr=1e-2, S=S)
    carry = (model.params, opt_state, jax.random.PRNGKey(0))
    chunk = min(100, n_epochs)
    carry, losses = loop(carry, chunk)  # compile + warmup
    losses.block_until_ready()
    done, t_total = 0, 0.0
    while done < n_epochs:
        t0 = time.perf_counter()
        carry, losses = loop(carry, chunk)
        losses.block_until_ready()
        t_total += time.perf_counter() - t0
        done += chunk
    return t_total * n_epochs / done


def time_reference(X, Y, n_samples_list, n_epochs):
    warnings.filterwarnings("ignore")
    sys.path.insert(0, "/root/reference")
    import torch
    from gpsa import VariationalGPSA as Ref

    x = torch.from_numpy(X).float()
    y = torch.from_numpy(Y).float()
    dd = {"expression": {"spatial_coords": x, "outputs": y, "n_samples_list": n_samples_list}}
    model = Ref(dd, n_spatial_dims=2, m_X_per_view=M, m_G=M,
                n_latent_gps={"expression": None})
    vi, Ns, _, _ = model.create_view_idx_dict(dd)
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    for _ in range(2):  # warmup
        _, _, _, F = model.forward({"expression": x}, view_idx=vi, Ns=Ns, S=S)
        loss = model.loss_fn(dd, F)
        opt.zero_grad(); loss.backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        _, _, _, F = model.forward({"expression": x}, view_idx=vi, Ns=Ns, S=S)
        loss = model.loss_fn(dd, F)
        opt.zero_grad(); loss.backward(); opt.step()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--sizes", type=int, nargs="+", default=[64, 484, 1024])
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    rows = []
    for n in args.sizes:
        X, Y, nsl, view_idx = make_data(n, seed=0)
        dt_ours = time_ours(X, Y, nsl, args.epochs)
        row = {"n_per_view": nsl[0], "ours_steps_per_sec": args.epochs / dt_ours}
        # OT baseline wall-clock (the reference's PASTE timing column,
        # two_dimensional_time_complexity.py:173-202)
        t0 = time.perf_counter()
        entropic_ot_align_views(X, Y, view_idx)
        row["ot_baseline_seconds"] = time.perf_counter() - t0
        if not args.skip_reference:
            n_ref = max(10, args.epochs // 10)  # reference is slow; subsample
            dt_ref = time_reference(X, Y, nsl, n_ref)
            row["reference_steps_per_sec"] = n_ref / dt_ref
            row["speedup"] = row["ours_steps_per_sec"] / row["reference_steps_per_sec"]
        rows.append(row)
        print(json.dumps(row), flush=True)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "time_experiment_results.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[-1].keys()))
        w.writeheader()
        w.writerows(rows)


if __name__ == "__main__":
    main()
