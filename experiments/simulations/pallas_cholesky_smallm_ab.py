"""Small-m accuracy gate for defaulting the Pallas Cholesky at m >= 48.

The fused Pallas batched Cholesky (ops/pallas_cholesky.py) was shipped
round-3 as an opt-in gated to m >= 128 after a 1.025x step-level win at the
Visium config. A north-star-config A/B then measured the small-m regime to
be where the XLA blocked factorization's serial per-iteration overhead
actually dominates: m=50 slab (14, 50, 50) is 25% of device step time, and
forcing the Pallas kernel there lifts the scanned train loop 1653 -> 1948
steps/s (+18%).

Small m is also the regime measured to be hypersensitive to factorization
perturbations (the jitter bisection, experiments/out/jitter_bisect_*.json:
a 1.3x nugget change regressed converged de-novo error ~4x). The kernel is
bit-different from XLA's (same algorithm class, different blocking), so the
default flip is gated on THIS experiment: the de-novo oracle config
(2-view 10x10 grids, m=50, accurate recipe, 10k epochs) trained to
convergence under each implementation. Pass = median aligned-error ratio
pallas/xla within noise of 1 and no non-finite runs.

Run: python experiments/simulations/pallas_cholesky_smallm_ab.py [n_seeds]
"""
import sys, json, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

import numpy as np, jax
from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.ops import linalg
from spatial_alignment_tpu.data import generate_twod_data

rows = []
for seed in range(N_SEEDS):
    rng = np.random.default_rng(seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng)
    dd = {"expression": {"spatial_coords": X.astype(np.float32),
                         "outputs": Y.astype(np.float32), "n_samples_list": nsl}}
    row = {"seed": seed}
    for impl in ("xla", "pallas"):
        linalg.set_cholesky_impl(impl)
        try:
            m = VariationalGPSA(dd, m_X_per_view=50, m_G=50,
                                n_latent_gps={"expression": 5},
                                mean_function="identity_fixed",
                                fixed_view_idx=None, seed=seed)
            t0 = time.time()
            losses = m.fit(n_epochs=10000, lr=1e-2, S=5, recipe="accurate")
            dt = time.time() - t0
            G, _, _ = m.predict({"expression": X.astype(np.float32)})
            g = G["expression"]
            err = float(np.mean(np.sum((g[view_idx[0]] - g[view_idx[1]]) ** 2,
                                       axis=1)))
            row[impl] = {"aligned_error": err, "steps_per_sec": 10000 / dt,
                         "finite": bool(np.all(np.isfinite(losses)))}
        except Exception as e:  # record the failure, keep prior seeds' rows
            row[impl] = {"error": f"{type(e).__name__}: {e}"}
        finally:
            linalg.set_cholesky_impl("auto")
    if all("aligned_error" in row.get(i, {}) for i in ("xla", "pallas")):
        row["ratio_pallas_over_xla"] = (
            row["pallas"]["aligned_error"] / row["xla"]["aligned_error"])
    rows.append(row)
    print(json.dumps(row), flush=True)

ok_rows = [r for r in rows if "ratio_pallas_over_xla" in r]
summary = {
    "config": "2-view 10x10 grids (200 spots), m=50, L=5, de-novo, "
              "recipe=accurate, 10k epochs, single restart",
    "platform": jax.devices()[0].platform,
    "rows": rows,
    "n_failed": len(rows) - len(ok_rows),
    "median_ratio_pallas_over_xla": float(
        np.median([r["ratio_pallas_over_xla"] for r in ok_rows])),
    "xla_median_aligned_error": float(
        np.median([r["xla"]["aligned_error"] for r in ok_rows])),
    "pallas_median_aligned_error": float(
        np.median([r["pallas"]["aligned_error"] for r in ok_rows])),
    "all_finite": bool(all(r["xla"]["finite"] and r["pallas"]["finite"]
                           for r in ok_rows)),
}
out = os.path.join(os.path.dirname(__file__), "..", "out",
                   "pallas_cholesky_smallm_ab.json")
with open(out, "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
