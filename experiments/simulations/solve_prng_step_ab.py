"""Step-throughput A/B: svgp_solve_mode {kl_inverse, mixed} x PRNG
{threefry2x32, rbg} at the two benchmark configs.

Two promotion decisions hang on this artifact:

1. **mixed as the auto solve mode.** The accuracy gates are committed
   (experiments/out/solve_mode_convergence_ab.json — m=200, 3 seeds, mixed
   median error ratio 1.17 vs solve at ~2e-5 absolute;
   solve_mode_smallm_ab.json — small-m oracle config, 10 seeds, mixed
   median ratio 0.83, i.e. accuracy-neutral-or-better in both sensitive
   regimes). What's missing is clean step-level throughput at BOTH bench
   configs under the scanned production loop (fit()-based numbers in the
   accuracy gates are polluted by host work between dispatches).
2. **The bench PRNG vs the library default.** bench.py historically forced
   the rbg generator for the TPU run while fit() users get jax's default
   threefry — either the delta is negligible (drop the override) or real
   (make rbg the library TPU default). This measures it at both configs.

Run: python experiments/simulations/solve_prng_step_ab.py
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


def northstar_data():
    import h5py

    path = "/root/reference/examples/synthetic_data.h5ad"
    if not os.path.exists(path):
        path = os.path.join(
            os.path.dirname(__file__), "..", "..", "examples", "synthetic_data.h5ad"
        )
    with h5py.File(path, "r") as f:
        X = np.asarray(f["obsm/spatial"]).astype(np.float32)
        Y = np.asarray(f["X"]).astype(np.float32)
        batch = np.asarray(f["obs/batch"])
    nsl = [int((batch == i).sum()) for i in sorted(set(batch.tolist()))]
    return X, Y, nsl


def visium_data():
    rng = np.random.default_rng(0)
    X, Y, nsl, _ = generate_twod_data(
        2, 30, grid_size=45, n_latent_gps=10, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    return X.astype(np.float32), Y.astype(np.float32), nsl


CONFIGS = {
    "northstar_m50": dict(data=northstar_data, m=50, lmc=None, chunk=200),
    "visium_m200": dict(data=visium_data, m=200, lmc=10, chunk=50),
}


def measure(X, Y, nsl, m, lmc, chunk, mode, prng, min_time=6.0):
    jax.config.update("jax_default_prng_impl", prng)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}
    model = VariationalGPSA(
        dd, m_X_per_view=m, m_G=m,
        n_latent_gps={"expression": lmc},
        mean_function="identity_fixed", fixed_view_idx=0,
        svgp_solve_mode=mode,
    )
    loop, opt_state = model.make_train_loop(lr=1e-2, S=5)
    carry = (model.params, opt_state, jax.random.PRNGKey(0))
    carry, losses = loop(carry, chunk)  # compile + warmup
    losses.block_until_ready()
    rates, t_total = [], 0.0
    while t_total < min_time:
        t0 = time.perf_counter()
        carry, losses = loop(carry, chunk)
        losses.block_until_ready()
        dt = time.perf_counter() - t0
        t_total += dt
        rates.append(chunk / dt)
    return float(np.median(rates)), float(losses[-1])


def main():
    out = {"platform": jax.devices()[0].platform, "configs": {}}
    for cname, cfg in CONFIGS.items():
        X, Y, nsl = cfg["data"]()
        cell = {}
        for mode in ("kl_inverse", "mixed"):
            for prng in ("threefry2x32", "rbg"):
                rate, loss = measure(
                    X, Y, nsl, cfg["m"], cfg["lmc"], cfg["chunk"], mode, prng
                )
                cell[f"{mode}/{prng}"] = {
                    "steps_per_sec": round(rate, 2),
                    "final_loss_finite": bool(np.isfinite(loss)),
                }
                print(json.dumps({cname: {f"{mode}/{prng}": round(rate, 2)}}),
                      flush=True)
        base = cell["kl_inverse/threefry2x32"]["steps_per_sec"]
        for k, v in cell.items():
            v["vs_kl_inverse_threefry"] = round(v["steps_per_sec"] / base, 3)
        out["configs"][cname] = cell
    path = os.path.join(os.path.dirname(__file__), "..", "out",
                        "solve_prng_step_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
