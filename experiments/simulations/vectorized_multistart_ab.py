"""Wall-clock A/B: vmapped-restart multistart vs sequential fits on TPU.

The restart axis is embarrassingly parallel and the single-restart step at
inducing-point scales is latency-bound on TPU (the chip idles between small
kernels), so training R parameter sets per step should cost much less than
R sequential fits. Config matches the oracle harness
(oracle_draw_match.py): seed-35 difficulty-matched draw, m=50, accurate
recipe, 16 restarts x 10k epochs, consistency selection + top-2 ensemble.

Run: python experiments/simulations/vectorized_multistart_ab.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data


def main():
    seed = 35
    rng = np.random.default_rng(seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    X32, Y32 = X.astype(np.float32), Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X32, "outputs": Y32,
                         "n_samples_list": nsl}}

    def err(coords):
        return float(np.mean(np.sum(
            (coords[view_idx[0]] - coords[view_idx[1]]) ** 2, axis=1)))

    out = {"config": "seed-35 oracle draw, m=50, recipe=accurate, "
                     "16 restarts x 10k epochs, consistency+top2",
           "arms": {}}
    for mode, vec in (("vectorized", True), ("sequential", False)):
        model = VariationalGPSA(
            dd, m_X_per_view=50, m_G=50, n_latent_gps={"expression": 5},
            mean_function="identity_fixed", fixed_view_idx=None, seed=seed,
        )
        t0 = time.time()
        model.fit_multistart(
            n_epochs=10000, n_restarts=16, seed0=seed * 100,
            recipe="accurate", select="consistency", ensemble_top_k=2,
            verbose=False, vectorized=vec,
        )
        wall = time.time() - t0
        aligned = np.asarray(model.ensemble_G_means_["expression"])
        out["arms"][mode] = {
            "wall_seconds": wall,
            "aligned_error_top2_ensemble": err(aligned),
        }
        print(json.dumps({mode: out["arms"][mode]}), flush=True)
    out["speedup"] = (
        out["arms"]["sequential"]["wall_seconds"]
        / out["arms"]["vectorized"]["wall_seconds"]
    )
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    with open(
        os.path.join(out_dir, "vectorized_multistart_ab.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"speedup": out["speedup"]}))


if __name__ == "__main__":
    main()
