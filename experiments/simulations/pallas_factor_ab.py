"""Step-level A/B: fused Pallas Cholesky+inverse vs the unfused XLA chain.

VERDICT r4 item 1: the factor pass's final Cholesky dispatch and the
explicit chol(Kuu)^-1 (tri_inverse) it feeds are the last unfused linalg
chain of the real-data step (reference hot path:
/root/reference/gpsa/models/vgpsa.py:174-204,314-331). The fused kernel
(ops/pallas_factor.py) produces both from one VMEM pass. The toggle is
ONLY ``fused_factor_inverse`` ("off" = shipped chain: Pallas/XLA Cholesky
per spec.cholesky_impl + XLA tri_inverse; "fused" = the new kernel); the
decision is made on scanned train-loop throughput, same protocol as
pallas_trisolve_step_ab.py, at the two regimes:

  * north-star (200 spots, m=50, S=5) — mixed solve mode engages the
    inverses only when forced (auto resolves kl_inverse here): measure
    under the shipped auto defaults.
  * Visium scale (N=4,050, m=200, S=5) — the mixed-mode default, where
    op_profile_visium.json attributes ~12% Cholesky + ~9% diag-block
    inversion + ~6% copies.

Run: python experiments/simulations/pallas_factor_ab.py
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


def build_model(grid_size, m, fused, seed=0):
    rng = np.random.default_rng(seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 30, grid_size=grid_size, n_latent_gps=10, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    X, Y = X.astype(np.float32), Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}
    return VariationalGPSA(
        dd, m_X_per_view=m, m_G=m, n_latent_gps={"expression": 10},
        mean_function="identity_fixed", fixed_view_idx=0, seed=seed,
        fused_factor_inverse=fused,
    )


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
    configs = {
        "northstar_m50": dict(grid_size=10, m=50),
        "visium_m200": dict(grid_size=45, m=200),
    }
    out = {"platform": jax.devices()[0].platform, "configs": {}}
    for name, cfg in configs.items():
        arms = {}
        for arm in ("off", "fused"):
            model = build_model(fused=arm, **cfg)
            sps, compile_s, loss = measure(model)
            arms[arm] = {
                "steps_per_sec": sps,
                "compile_seconds": compile_s,
                "final_loss": loss,
                "solve_mode": model.spec.svgp_solve_mode,
            }
            print(json.dumps({name: {arm: arms[arm]}}), flush=True)
        arms["speedup_fused"] = (
            arms["fused"]["steps_per_sec"] / arms["off"]["steps_per_sec"]
        )
        out["configs"][name] = arms
        print(json.dumps({name: arms["speedup_fused"]}), flush=True)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    with open(os.path.join(out_dir, "pallas_factor_step_ab.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
