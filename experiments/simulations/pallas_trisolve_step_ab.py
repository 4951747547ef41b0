"""Step-level A/B: fused Pallas triangular solve vs XLA in the real train step.

Both arms run the Pallas Cholesky (the shipped round-3 default); the toggle
is ONLY the substitution kernel (ops/pallas_trisolve), so the measured delta
is this change alone. Micro-benchmarks are dispatch-noise-bound through the
tunnel (see pallas_cholesky_step_ab.py), so the decision is made on scanned
train-loop throughput at the two regimes the committed op profiles attribute
the remaining serial-linalg share to:

  * north-star (200 spots, m=50, S=5): triangular-solve block loops ~37%
    of the device step (op profile, r3 regeneration)
  * Visium scale (N=4,050, m=200, S=5): ~13-20%

Run: python experiments/simulations/pallas_trisolve_step_ab.py
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


def build_model(grid_size, m, seed=0):
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
    real_ok = linalg._trisolve_pallas_ok

    def narrow_ok(impl, m, n, batch, dtype, identity_rhs=False):
        # Only slabs whose padded RHS is no wider than the padded factor:
        # tri_inverse, the KL (m, m+k) slabs, and narrow cholesky_solves.
        # Wide Kuf solves stay on XLA, whose invert-diag-blocks +
        # block-matmul lowering is MXU-efficient at large n.
        if n > -(-m // 128) * 128:
            return False
        return real_ok(impl, m, n, batch, dtype, identity_rhs)

    gates = {
        "xla_trisolve": lambda *a, **k: False,
        "pallas_narrow": narrow_ok,
        "pallas_all": real_ok,
    }
    out = {"platform": jax.devices()[0].platform, "configs": {}}
    for name, cfg in configs.items():
        arms = {}
        for arm, gate in gates.items():
            # Toggle ONLY the substitution kernel (every site, including the
            # Pallas Cholesky VJP's trans-solves, consults this gate); the
            # Cholesky kernel itself stays at its shipped default in all arms.
            linalg._trisolve_pallas_ok = gate
            try:
                model = build_model(**cfg)
                sps, compile_s, loss = measure(model)
            finally:
                linalg._trisolve_pallas_ok = real_ok
            arms[arm] = {"steps_per_sec": sps, "compile_seconds": compile_s,
                         "final_loss": loss}
            print(json.dumps({name: {arm: arms[arm]}}), flush=True)
        for arm in ("pallas_narrow", "pallas_all"):
            arms[f"speedup_{arm}"] = (arms[arm]["steps_per_sec"]
                                      / arms["xla_trisolve"]["steps_per_sec"])
        out["configs"][name] = arms
        print(json.dumps({name: {k: v for k, v in arms.items()
                                 if k.startswith("speedup")}}), flush=True)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    with open(os.path.join(out_dir, "pallas_trisolve_step_ab.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
