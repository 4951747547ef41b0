"""Step-level A/B: fused Pallas quad-diag kernel (and the variance-precision
knob) inside the real train step at the Visium-scale config.

The m=200 op profile attributes ~39% of device step time to the variance
quadratic forms' materialized (S, N, L, m) product tensor (162 MB written +
~3x re-read per step) and its MXU passes. Two stacked levers are measured
here on scanned-loop training throughput (micro-benchmarks are tunnel-
latency-bound on this machine):

  * ops/pallas_quad.py — fused kernel + recompute VJP: the product tensor
    never touches HBM (spec.quad_diag_impl);
  * spec.svgp_variance_precision="default" — 1-pass bf16 MXU for those
    products only (the predictive mean keeps svgp_matmul_precision; the
    convergence-level accuracy gate is variance_precision_ab.json).

Also validates the kernel's numerics on the real TPU (fwd + VJP vs the
inline jnp form at matching precision) before timing anything.

Run: python experiments/simulations/quad_pallas_step_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data
from spatial_alignment_tpu.ops import pallas_quad as pq


def tpu_numerics():
    """Real-TPU kernel-vs-jnp check at the Visium shapes."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 1024, 200)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((10, 200, 200)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((5, 10, 1024)), jnp.float32)
    rows = {}
    for prec in ("highest", "high", "default"):
        pal = jax.jit(lambda a, b: pq.quad_diag(a, b, prec, True))
        ref = jax.jit(lambda a, b: pq._quad_jnp(a, b, prec))
        got, want = np.asarray(pal(x, F)), np.asarray(ref(x, F))
        scale = np.abs(want).max()
        fwd_rel = float(np.abs(got - want).max() / scale)
        gp = jax.jit(jax.grad(lambda a, b: jnp.vdot(
            pq.quad_diag(a, b, prec, True), g), argnums=(0, 1)))
        gr = jax.jit(jax.grad(lambda a, b: jnp.vdot(
            pq._quad_jnp(a, b, prec), g), argnums=(0, 1)))
        (gx1, gF1), (gx2, gF2) = gp(x, F), gr(x, F)
        vjp_rel = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()
                  / max(np.abs(np.asarray(b)).max(), 1e-30))
            for a, b in ((gx1, gx2), (gF1, gF2))
        )
        rows[prec] = {"fwd_max_rel": fwd_rel, "vjp_max_rel": vjp_rel}
        print(json.dumps({prec: rows[prec]}), flush=True)
    return rows


def build_model(quad_impl, variance_precision, seed=0):
    rng = np.random.default_rng(seed)
    X, Y, nsl, _ = generate_twod_data(
        2, 30, grid_size=45, n_latent_gps=10, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    X, Y = X.astype(np.float32), Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}
    return VariationalGPSA(
        dd, m_X_per_view=200, m_G=200, n_latent_gps={"expression": 10},
        mean_function="identity_fixed", fixed_view_idx=0, seed=seed,
        quad_diag_impl=quad_impl, svgp_variance_precision=variance_precision,
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
    out = {
        "config": "N=4050, m=200, S=5, L=10, template view 0, scanned loop",
        "platform": jax.devices()[0].platform,
        "tpu_numerics": tpu_numerics(),
        "arms": {},
    }
    # "xla" = what ships ("auto" resolves to it after the recorded run
    # showed the kernel losing); "pallas" forces every applicable site.
    # The committed artifact's "auto" arms are the historical size-dispatch
    # variant (data layer dispatched, small vmapped warp slabs inline).
    for quad_impl in ("xla", "pallas"):
        for vp in ("follow", "default"):
            name = f"{quad_impl}+{vp}"
            model = build_model(quad_impl, vp)
            sps, compile_s, loss = measure(model)
            out["arms"][name] = {
                "steps_per_sec": sps,
                "compile_seconds": compile_s,
                "loss_after_400_steps": loss,
            }
            print(json.dumps({name: out["arms"][name]}), flush=True)
    base = out["arms"]["xla+follow"]["steps_per_sec"]
    out["speedups_over_xla_follow"] = {
        k: v["steps_per_sec"] / base for k, v in out["arms"].items()
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    with open(os.path.join(out_dir, "quad_pallas_step_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["speedups_over_xla_follow"]))


if __name__ == "__main__":
    main()
