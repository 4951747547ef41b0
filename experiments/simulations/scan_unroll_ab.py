"""A/B: ``lax.scan`` unroll factor on the fused train loop.

The north-star config (m=50, 200 spots) runs ~1,900+ steps/s — ~500 us per
step of mostly-small ops, so the scanned loop's per-iteration while-loop
overhead (loop-carried buffer threading, trip-count bookkeeping) is a
candidate cost. ``lax.scan(..., unroll=k)`` emits k step bodies per while
iteration, amortizing that overhead at the cost of a k-times-larger program
(compile time, instruction-cache pressure).

Arms: unroll in {1, 2, 4, 8} at the north-star (m=50) and the m=200
Visium-scale config, on the production loss/step closure (the measured
body is identical to make_train_loop's — same loss_fn, optax update, RNG
chain; only the scan call differs).

Decision rule: promote a default only on a >= ~3% win at either config
outside the ±1-2% same-session noise, with identical final loss (the math
is unchanged — any loss drift means a bug, not a trade).

Run: python experiments/simulations/scan_unroll_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import optax

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data


def bench_config(name, X, Y, nsl, m, lmc, epochs, out):
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}
    model = VariationalGPSA(
        dd, m_X_per_view=m, m_G=m, n_latent_gps={"expression": lmc},
        fixed_view_idx=0, seed=0,
    )
    loss_fn = model._loss_fn(None)
    tx = optax.adam(1e-2)

    def one(carry, temp):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(params, sub, 5, temp)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    row = {}
    for unroll in (1, 2, 4, 8):
        scan_loop = jax.jit(
            lambda carry, temps, u=unroll: jax.lax.scan(
                one, carry, temps, unroll=u
            )
        )
        temps = jnp.ones(epochs, jnp.float32)
        carry = (model.params, tx.init(model.params), model._key)
        t0 = time.time()
        carry2, losses = scan_loop(carry, temps)
        jax.block_until_ready(losses)
        compile_s = time.time() - t0
        # timed: fresh carry each rep (no donation here — identical across
        # arms, so the comparison is apples-to-apples)
        reps = []
        for _ in range(3):
            carry = (model.params, tx.init(model.params), model._key)
            t0 = time.time()
            carry2, losses = scan_loop(carry, temps)
            jax.block_until_ready(losses)
            reps.append(epochs / (time.time() - t0))
        row[f"unroll{unroll}"] = {
            "steps_per_sec": float(np.median(reps)),
            "compile_seconds": compile_s,
            "final_loss": float(losses[-1]),
        }
        print(json.dumps({name: {f"unroll{unroll}": row[f"unroll{unroll}"]}}),
              flush=True)
    base = row["unroll1"]["steps_per_sec"]
    for k in row:
        row[k]["speedup_vs_unroll1"] = row[k]["steps_per_sec"] / base
    out[name] = row


def main():
    out = {"platform": jax.devices()[0].platform}
    rng = np.random.default_rng(0)
    X, Y, nsl, _ = generate_twod_data(
        2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    bench_config("northstar_m50", X.astype(np.float32), Y.astype(np.float32),
                 nsl, 50, None, 3000, out)
    rng = np.random.default_rng(0)
    X, Y, nsl, _ = generate_twod_data(
        2, 30, grid_size=45, n_latent_gps=10, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    bench_config("visium_m200", X.astype(np.float32), Y.astype(np.float32),
                 nsl, 200, 10, 800, out)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "scan_unroll_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote scan_unroll_ab.json", flush=True)


if __name__ == "__main__":
    main()
