"""Where does the m=200 real-data training step spend its time?

VERDICT r2 item 3: STATUS claimed "gram is a few percent of step time" at the
Visium config (N=4,000 total spots, m=200 inducing, S=5 — the reference's
real-data config, /root/reference/experiments/expression/visium/
visium_alignment.py:48-49) with no committed profile. This harness measures
it three ways and writes experiments/out/step_profile.json:

  1. scanned-loop steps/s for each parameterization
     {square, triangular, whitened} — the parameterizations differ exactly
     in which per-step m^3 work they carry:
       square      3 probed Kuu factorizations (3x cost each: 2 probes +
                   1 real) + (V*D + L) variational factorizations
                   + 2 triangular solves per predictive
       triangular  drops the variational factorizations
       whitened    additionally drops the KL's Kuu solves and halves the
                   predictive solves (one L^-1 Kuf per layer)
     so the deltas ARE the attribution of factorization/solve cost;
  2. forward-vs-train split (is the backward pass balanced?);
  3. XLA cost analysis (model FLOPs/step) -> achieved FLOP/s per variant.

Run: python experiments/expression/visium/step_profile.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data

M = 200
S = 5
N_GENES = 30
L = 10


def make_data(seed=0):
    # 2 views x ~2000 spots: the Visium two-slice scale
    rng = np.random.default_rng(seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, N_GENES, grid_size=45, n_latent_gps=L, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    return X.astype(np.float32), Y.astype(np.float32), nsl


def timed_loop(model, chunk=50, min_time=4.0, lr=1e-2):
    import jax

    import jax.numpy as jnp

    loop, opt_state = model.make_train_loop(lr=lr, S=S)
    # the scanned loop donates its carry: feed it a copy so model.params
    # stays alive for the later forward-only / cost-analysis measurements
    carry = (
        jax.tree.map(jnp.copy, model.params), opt_state, jax.random.PRNGKey(0)
    )
    t0 = time.perf_counter()
    carry, losses = loop(carry, chunk)
    losses.block_until_ready()
    compile_s = time.perf_counter() - t0
    rates, t_total = [], 0.0
    while t_total < min_time:
        t0 = time.perf_counter()
        carry, losses = loop(carry, chunk)
        losses.block_until_ready()
        dt = time.perf_counter() - t0
        t_total += dt
        rates.append(chunk / dt)
    assert np.isfinite(float(losses[-1]))
    return float(np.median(rates)), compile_s


def forward_only_rate(model, chunk=50, min_time=4.0):
    """ELBO value only (no grad, no optimizer) under the same scan."""
    import jax
    import jax.numpy as jnp
    from spatial_alignment_tpu.models import core

    spec, consts, batch = model.spec, model.consts, model._batch

    def one(carry, _):
        params, key = carry
        key, sub = jax.random.split(key)
        loss = core.negative_elbo(spec, params, consts, batch, sub, S, 1.0)
        return (params, key), loss

    @jax.jit
    def run(carry):
        return jax.lax.scan(one, carry, jnp.zeros(chunk))

    carry = (model.params, jax.random.PRNGKey(0))
    carry, losses = run(carry)
    losses.block_until_ready()
    rates, t_total = [], 0.0
    while t_total < min_time:
        t0 = time.perf_counter()
        carry, losses = run(carry)
        losses.block_until_ready()
        dt = time.perf_counter() - t0
        t_total += dt
        rates.append(chunk / dt)
    return float(np.median(rates))


def flops_per_step(model, lr=1e-2):
    import jax
    import jax.numpy as jnp
    import optax
    from spatial_alignment_tpu.models import core

    spec, consts, batch = model.spec, model.consts, model._batch
    tx = optax.adam(lr)

    def one(carry, temp):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(core.negative_elbo, argnums=1)(
            spec, params, consts, batch, sub, S, temp
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    try:
        carry = (model.params, tx.init(model.params), jax.random.PRNGKey(0))
        temps = jnp.ones(10, jnp.float32)
        compiled = (
            jax.jit(lambda c, t: jax.lax.scan(one, c, t)).lower(carry, temps).compile()
        )
        an = compiled.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an["flops"]) / 10
    except Exception:
        return None


def main():
    X, Y, nsl = make_data()
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}

    variants = {}
    for name, kw in (
        ("square", {}),
        ("triangular", {"triangular_variational": True}),
        ("whitened", {"whitened_variational": True}),
        # bf16 3-pass MXU for the O(m^2 N) projection matmuls (measured safe:
        # tests/test_model_core.py precision A/B) — the remaining
        # accuracy-neutral speed candidate at m=200
        ("square_prec_high", {"svgp_matmul_precision": "high"}),
        ("triangular_prec_high", {"triangular_variational": True,
                                  "svgp_matmul_precision": "high"}),
    ):
        model = VariationalGPSA(
            dd, m_X_per_view=M, m_G=M, n_latent_gps={"expression": L},
            mean_function="identity_fixed", fixed_view_idx=0, seed=0, **kw,
        )
        sps, compile_s = timed_loop(model)
        fwd = forward_only_rate(model)
        fl = flops_per_step(model)
        variants[name] = {
            "train_steps_per_sec": sps,
            "forward_steps_per_sec": fwd,
            # share of step time beyond the forward ELBO (backward + Adam):
            # (1/sps - 1/fwd) / (1/sps)
            "backward_share": max(0.0, 1.0 - sps / fwd),
            "compile_seconds": compile_s,
            "model_gflops_per_step": fl / 1e9 if fl else None,
            "achieved_gflops_per_sec": fl * sps / 1e9 if fl else None,
        }
        print(json.dumps({name: variants[name]}), flush=True)

    sq = variants["square"]["train_steps_per_sec"]
    out = {
        "config": f"N={sum(nsl)} spots (2 views), m={M}, S={S}, L={L}, "
                  "template view 0",
        "variants": variants,
        "speedup_vs_square": {
            k: v["train_steps_per_sec"] / sq for k, v in variants.items()
        },
        "attribution_note": (
            "square->triangular delta = per-step variational-covariance "
            "factorizations ((V*D + L) = 14 batched m^3 Choleskys); "
            "triangular->whitened delta = KL Kuu-solves + one of two "
            "predictive triangular solves per layer"
        ),
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "step_profile.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["speedup_vs_square"], indent=2))


if __name__ == "__main__":
    main()
