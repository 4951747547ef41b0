"""Micro-benchmark: fused Pallas batched Cholesky vs XLA's, on real TPU.

Configs mirror the library's actual factorization sites: (14, 200, 200) is
the Visium-scale step's variational-covariance batch (V*D + L at m=200),
(4, 200, 200) its Kuu batch, (34, 50, 50) the north-star config's combined
batch. Times forward and forward+VJP (the VJP is shared algebra — XLA
triangular solves — so the delta isolates the forward kernel).

Run: python experiments/simulations/pallas_cholesky_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from spatial_alignment_tpu.ops import pallas_cholesky as pc


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    results = {"platform": jax.devices()[0].platform, "configs": []}
    for B, m in [(14, 200, ), (4, 200), (34, 50), (14, 128), (30, 256)]:
        a = rng.standard_normal((B, m, m)).astype(np.float32)
        a = a @ np.swapaxes(a, -1, -2) + m * np.eye(m, dtype=np.float32)
        a = jnp.asarray(a)
        w = jnp.asarray(
            rng.standard_normal((B, m, m)).astype(np.float32)
        )

        f_pallas = jax.jit(pc.cholesky)
        f_xla = jax.jit(jnp.linalg.cholesky)
        g_pallas = jax.jit(jax.grad(lambda x: jnp.sum(pc.cholesky(x) * w)))
        g_xla = jax.jit(
            jax.grad(lambda x: jnp.sum(jnp.linalg.cholesky(x) * w))
        )

        L_p = np.asarray(f_pallas(a))
        L_x = np.asarray(f_xla(a))
        rel = float(
            np.abs(L_p - L_x).max() / max(np.abs(L_x).max(), 1e-30)
        )
        gr = float(
            np.abs(np.asarray(g_pallas(a)) - np.asarray(g_xla(a))).max()
            / max(np.abs(np.asarray(g_xla(a))).max(), 1e-30)
        )

        row = {
            "batch": B,
            "m": m,
            "max_rel_err_fwd": rel,
            "max_rel_err_grad": gr,
            "fwd_pallas_ms": timeit(f_pallas, a),
            "fwd_xla_ms": timeit(f_xla, a),
            "grad_pallas_ms": timeit(g_pallas, a),
            "grad_xla_ms": timeit(g_xla, a),
        }
        row["fwd_speedup"] = row["fwd_xla_ms"] / row["fwd_pallas_ms"]
        row["grad_speedup"] = row["grad_xla_ms"] / row["grad_pallas_ms"]
        results["configs"].append(row)
        print(json.dumps(row), flush=True)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "pallas_cholesky_bench.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"saved": True}))


if __name__ == "__main__":
    main()
