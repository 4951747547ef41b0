"""Resolve the Pallas-Gram >32M-element gap (VERDICT r4 item 6).

The fused Gram kernel's dispatch window is [256K, 32M] output elements
(pallas_ab.json); its own motivating config (ops/pallas_gram.py:4-10 —
the S-batched Kuf at Slide-seq scale, S=5 x m=200 x N=50k ~ 50M elements)
falls ABOVE it and silently takes the XLA path. This script settles the
regime with a bandwidth-roof accounting (reference FLOP-peak site:
/root/reference/gpsa/models/vgpsa.py:409):

  * arms at N in {20k, 50k, 100k} (m=200, S=5, D=2):
      - jnp       : XLA's fused broadcast/matmul lowering (the dispatch
                    default above 32M)
      - pallas_f32: the shipped kernel, forced
      - pallas_bf16: same kernel with a bf16 OUTPUT store (f32 arithmetic
                    in VMEM) — above 32M the op is HBM-WRITE-bound, so
                    halving output bytes is the one remaining lever. Only
                    meaningful if a consumer accepts bf16 Kuf; measured
                    here to bound what that would buy.
  * each arm reports achieved GB/s against the v5e HBM roof (~819 GB/s):
    bytes = inputs (coords) + output tensor, one pass each.

Decision rule: if jnp runs at >= ~80% of roof, the window's upper edge is
physics, not a missing kernel — document it in PERF.md and keep dispatch
as is. If pallas_bf16 clears jnp by ~2x (write-bound prediction), a
bf16-Kuf consumer path is worth a follow-up accuracy gate.

Run: python experiments/simulations/gram_large_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from spatial_alignment_tpu.ops import pallas_gram as pg

V5E_HBM_GBPS = 819.0  # v5e spec sheet HBM bandwidth


def measure(fn, *args, reps=20):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def main():
    rng = np.random.default_rng(0)
    m, S, D = 200, 5, 2
    log_ls = jnp.float32(np.log(5.0))
    log_var = jnp.float32(np.log(0.5))
    x1 = jnp.asarray(rng.standard_normal((m, D)).astype(np.float32) * 5)

    out = {"platform": jax.devices()[0].platform, "roof_gbps": V5E_HBM_GBPS,
           "configs": {}}
    for N in (20_000, 50_000, 100_000):
        x2 = jnp.asarray(
            rng.standard_normal((S, N, D)).astype(np.float32) * 5
        )
        n_out = S * m * N
        out_bytes_f32 = 4 * n_out
        in_bytes = 4 * (m * D + S * N * D)

        arms = {}

        def jnp_arm(a, b):
            return pg.gram(a, b, log_ls, log_var, "rbf", force=False)

        def pallas_f32(a, b):
            return pg.pallas_gram(a, b, log_ls, log_var, "rbf")

        def pallas_bf16(a, b):
            return pg.pallas_gram(
                a, b, log_ls, log_var, "rbf", out_dtype=jnp.bfloat16
            )

        t_jnp, K_ref = measure(jnp_arm, x1, x2)
        arms["jnp"] = {
            "seconds": t_jnp,
            "achieved_gbps": (out_bytes_f32 + in_bytes) / t_jnp / 1e9,
        }
        t_pf, K_pf = measure(pallas_f32, x1, x2)
        rel_f32 = float(
            jnp.max(jnp.abs(K_pf - K_ref)) / jnp.max(jnp.abs(K_ref))
        )
        arms["pallas_f32"] = {
            "seconds": t_pf,
            "achieved_gbps": (out_bytes_f32 + in_bytes) / t_pf / 1e9,
            "rel_err_vs_jnp": rel_f32,
        }
        t_pb, K_pb = measure(pallas_bf16, x1, x2)
        rel_bf16 = float(
            jnp.max(jnp.abs(K_pb.astype(jnp.float32) - K_ref))
            / jnp.max(jnp.abs(K_ref))
        )
        arms["pallas_bf16_out"] = {
            "seconds": t_pb,
            "achieved_gbps": (out_bytes_f32 // 2 + in_bytes) / t_pb / 1e9,
            "rel_err_vs_jnp": rel_bf16,
        }
        arms["n_out_elements"] = n_out
        arms["out_mb_f32"] = out_bytes_f32 / 1e6
        arms["jnp_roof_fraction"] = arms["jnp"]["achieved_gbps"] / V5E_HBM_GBPS
        arms["speedup_pallas_f32"] = t_jnp / t_pf
        arms["speedup_pallas_bf16"] = t_jnp / t_pb
        out["configs"][f"N{N}"] = arms
        print(json.dumps({f"N{N}": {k: v for k, v in arms.items()
                                    if not isinstance(v, dict)}}), flush=True)
        print(json.dumps({f"N{N}_arms": {k: v for k, v in arms.items()
                                         if isinstance(v, dict)}}), flush=True)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "gram_large_ab.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
