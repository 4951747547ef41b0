"""Resolve the Pallas-Gram >32M-element gap (VERDICT r4 item 6).

The fused Gram kernel's dispatch window is [256K, 32M] output elements
(pallas_ab.json); its own motivating config (ops/pallas_gram.py:4-10 —
the S-batched Kuf at Slide-seq scale, S=5 x m=200 x N=50k ~ 50M elements)
falls ABOVE it and silently takes the XLA path. This script settles the
regime with a bandwidth-roof accounting (reference FLOP-peak site:
/root/reference/gpsa/models/vgpsa.py:409):

  * arms at N in {20k, 50k, 100k} (m=200, S=5, D=2):
      - jnp        : XLA's expansion-form lowering, run (as production
                     does — models/core.py:955 wraps the whole forward)
                     under matmul precision "highest"
      - pallas_f32 : the shipped kernel, forced
      - pallas_bf16: same kernel with a bf16 OUTPUT store (f32 arithmetic
                     in VMEM) — above 32M the op is HBM-WRITE-bound, so
                     halving output bytes is the one remaining lever. Only
                     meaningful if a consumer accepts bf16 Kuf; measured
                     here to bound what that would buy.

Measurement notes (the first cut of this harness got both wrong):
  * each arm is timed INSIDE one jitted ``lax.fori_loop`` — a fresh
    ``jax.jit(fn)`` per rep retraces every call, and a per-call
    ``block_until_ready`` through the axon tunnel has a ~23 ms dispatch
    floor that swamps a ~1 ms op. Iterations are serialized by feeding a
    checksum back into the inputs; ``lax.optimization_barrier`` keeps XLA
    from fusing the (cheap) checksum consumer into the producer, so the
    full output tensor materializes in HBM exactly as in production.
    Per-op time = (t(R1) - t(R0)) / (R1 - R0) differences away the
    remaining fixed overhead.
  * accuracy is judged against a float64 numpy oracle on an N-slice —
    the first cut compared Pallas against a DEFAULT-precision jnp arm,
    whose own bf16 sqdist error (~5% at these coordinate scales!) it then
    misattributed to the kernel. Production never runs that arm: the
    forward pass pins "highest".

Decision rule: if jnp runs at >= ~80% of roof, the window's upper edge is
physics, not a missing kernel — document it in PERF.md and keep dispatch
as is. If pallas_bf16 clears jnp by ~2x (write-bound prediction), a
bf16-Kuf consumer path is worth a follow-up accuracy gate.

Run: python experiments/simulations/gram_large_ab.py
"""

import functools
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

ORACLE_COLS = 2048  # f64 numpy oracle compares this N-slice of each arm


def _looped(op, x1, x2, reps: int):
    """Run op reps times inside one program, serialized via a checksum."""

    def body(_, carry):
        chk = carry
        # 1e-30 * chk is runtime-zero but not foldable: serializes iterations.
        K = op(x1, x2 + chk * jnp.float32(1e-30))
        K = jax.lax.optimization_barrier(K)  # force full HBM materialization
        return jnp.sum(K[..., 0, :].astype(jnp.float32))

    return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))


def measure(op, x1, x2, out_bytes, outer=5):
    # Size-adaptive rep count: aim for ~100 ms of differenced device work so
    # small ops (tens of us) aren't lost in per-call tunnel noise (~ms).
    est = out_bytes / 400e9  # assume ~half the HBM roof
    r0, r1 = 2, 2 + int(np.clip(np.ceil(0.1 / est), 10, 2000))
    fns = {}
    for reps in (r0, r1):
        fns[reps] = jax.jit(functools.partial(_looped, op, x1, x2, reps))
        fns[reps]().block_until_ready()  # compile + warm
    per_op = []
    for _ in range(outer):
        ts = {}
        for reps in (r0, r1):
            t0 = time.perf_counter()
            fns[reps]().block_until_ready()
            ts[reps] = time.perf_counter() - t0
        per_op.append((ts[r1] - ts[r0]) / (r1 - r0))
    return float(np.median(per_op))


def main():
    rng = np.random.default_rng(0)
    m, S, D = 200, 5, 2
    log_ls_f = np.log(5.0)
    log_var_f = np.log(0.5)
    log_ls = jnp.float32(log_ls_f)
    log_var = jnp.float32(log_var_f)
    x1_np = rng.standard_normal((m, D)).astype(np.float32) * 5
    x1 = jnp.asarray(x1_np)

    def jnp_arm(a, b):
        # production context: models/core.py:955 pins "highest" for the step
        with jax.default_matmul_precision("highest"):
            return pg.gram(a, b, log_ls, log_var, "rbf", force=False)

    def pallas_f32(a, b):
        return pg.pallas_gram(a, b, log_ls, log_var, "rbf")

    def pallas_bf16(a, b):
        return pg.pallas_gram(
            a, b, log_ls, log_var, "rbf", out_dtype=jnp.bfloat16
        )

    out = {
        "platform": jax.devices()[0].platform,
        "roof_gbps": V5E_HBM_GBPS,
        "method": "loop-in-jit, optimization_barrier-materialized, "
                  "size-adaptive rep-count differenced; err vs float64 "
                  f"numpy oracle on a {ORACLE_COLS}-column slice",
        "configs": {},
    }
    # 1k-20k probe the shipped dispatch window [256K, 32M] (1M-20M elems);
    # 50k/100k are the >32M regime VERDICT item 6 asks about.
    for N in (1_000, 5_000, 20_000, 50_000, 100_000):
        x2_np = rng.standard_normal((S, N, D)).astype(np.float32) * 5
        x2 = jnp.asarray(x2_np)
        n_out = S * m * N
        out_bytes_f32 = 4 * n_out
        in_bytes = 4 * (m * D + S * N * D)

        # float64 oracle on a column slice
        cols = min(N, ORACLE_COLS)
        xs = x2_np[:, :cols].astype(np.float64)
        d2 = np.sum(
            (x1_np.astype(np.float64)[None, :, None] - xs[:, None]) ** 2,
            axis=-1,
        )
        K64 = np.exp(log_var_f) * np.exp(-0.5 * d2 / np.exp(2 * log_ls_f))
        scale = np.max(np.abs(K64))

        def rel_err(K):
            Ks = np.asarray(K[..., :cols], dtype=np.float64)
            return float(np.max(np.abs(Ks - K64)) / scale)

        arms = {}
        for name, op, bytes_out in (
            ("jnp", jnp_arm, out_bytes_f32),
            ("pallas_f32", pallas_f32, out_bytes_f32),
            ("pallas_bf16_out", pallas_bf16, out_bytes_f32 // 2),
        ):
            K = jax.jit(op)(x1, x2)
            err = rel_err(jax.device_get(K).astype(np.float32))
            del K
            t = measure(op, x1, x2, bytes_out)
            arms[name] = {
                "seconds_per_op": t,
                "achieved_gbps": (bytes_out + in_bytes) / t / 1e9,
                "roof_fraction": (bytes_out + in_bytes) / t / 1e9 / V5E_HBM_GBPS,
                "rel_err_vs_f64": err,
            }
            print(json.dumps({f"N{N}:{name}": arms[name]}), flush=True)

        arms["n_out_elements"] = n_out
        arms["out_mb_f32"] = out_bytes_f32 / 1e6
        arms["speedup_pallas_f32"] = (
            arms["jnp"]["seconds_per_op"] / arms["pallas_f32"]["seconds_per_op"]
        )
        arms["speedup_pallas_bf16"] = (
            arms["jnp"]["seconds_per_op"]
            / arms["pallas_bf16_out"]["seconds_per_op"]
        )
        out["configs"][f"N{N}"] = arms

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "gram_large_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote gram_large_ab.json", flush=True)


if __name__ == "__main__":
    main()
