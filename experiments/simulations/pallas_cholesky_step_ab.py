"""Step-level A/B: fused Pallas Cholesky vs XLA inside the real train step.

Micro-benchmarks of the factorization op alone are dominated by per-dispatch
tunnel latency on this machine (the committed micro numbers in
pallas_cholesky_bench.json swing 0.3x-1.8x run to run), so the decision is
made where it matters: scanned-loop training throughput at the Visium-scale
config (N=4,050, m=200, S=5, template view 0) whose variational-covariance
factorizations are ~23% of the step (step_profile.json).

Run: python experiments/simulations/pallas_cholesky_step_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data
from spatial_alignment_tpu.ops import linalg


def build_model(seed=0):
    rng = np.random.default_rng(seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 30, grid_size=45, n_latent_gps=10, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    X, Y = X.astype(np.float32), Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}
    model = VariationalGPSA(
        dd, m_X_per_view=200, m_G=200, n_latent_gps={"expression": 10},
        mean_function="identity_fixed", fixed_view_idx=0, seed=seed,
    )
    return model, X, view_idx


def measure(model, chunk=200, min_time=8.0):
    loop, opt_state = model.make_train_loop(lr=1e-2, S=5)
    carry = (model.params, opt_state, jax.random.PRNGKey(0))
    t0 = time.time()
    carry, losses = loop(carry, chunk)
    losses.block_until_ready()
    compile_s = time.time() - t0
    rates, t_total = [], 0.0
    while t_total < min_time:
        t0 = time.perf_counter()
        carry, losses = loop(carry, chunk)
        losses.block_until_ready()
        dt = time.perf_counter() - t0
        t_total += dt
        rates.append(chunk / dt)
    return float(np.median(rates)), compile_s, float(losses[-1])


def main():
    out = {"config": "N=4050, m=200, S=5, L=10, template view 0",
           "platform": jax.devices()[0].platform, "arms": {}}
    for impl in ("xla", "pallas"):
        linalg.set_cholesky_impl(impl)
        model, _, _ = build_model()
        sps, compile_s, loss = measure(model)
        out["arms"][impl] = {
            "steps_per_sec": sps,
            "compile_seconds": compile_s,
            "loss_after_400_steps": loss,
        }
        print(json.dumps({impl: out["arms"][impl]}), flush=True)
    linalg.set_cholesky_impl("xla")
    out["speedup_pallas_over_xla"] = (
        out["arms"]["pallas"]["steps_per_sec"]
        / out["arms"]["xla"]["steps_per_sec"]
    )
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    with open(os.path.join(out_dir, "pallas_cholesky_step_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"speedup": out["speedup_pallas_over_xla"]}))


if __name__ == "__main__":
    main()
