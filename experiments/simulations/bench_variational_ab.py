"""A/B the variational-covariance parameterization on the exact bench config.

bench.py measures ELBO steps/s on the north-star config (synthetic_data.h5ad,
m=50, S=5, template view 0, Adam 1e-2). The triangular (GPflow-style q_sqrt)
parameterization removes every per-step variational-covariance factorization
and is ~1.5x faster — but it is only an acceptable default for the bench if
the *converged alignment quality* on this config matches the square
(reference-parity) parameterization. This harness trains both to convergence
from identical inits across seeds and records aligned-view error + final
ELBO, writing experiments/out/bench_variational_ab.json.

Run: python experiments/simulations/bench_variational_ab.py [--epochs 4000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def load_bench_data():
    # the benchmark's own loader, so this A/B runs on exactly the bench data
    from bench import load_data

    return load_data()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    from spatial_alignment_tpu import VariationalGPSA

    X, Y, nsl = load_bench_data()
    n0 = nsl[0]
    dd = {"expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": nsl}}

    def run(seed, triangular):
        model = VariationalGPSA(
            dd, m_X_per_view=50, m_G=50, n_latent_gps={"expression": None},
            mean_function="identity_fixed", fixed_view_idx=0, seed=seed,
            triangular_variational=triangular,
        )
        losses = model.fit(args.epochs, lr=1e-2, S=5)
        G, _, _ = model.predict({"expression": X})
        g = G["expression"]
        err = float(np.mean(np.sum((g[:n0] - g[n0:]) ** 2, axis=1)))
        return err, float(np.mean(losses[-100:]))

    obs_err = float(np.mean(np.sum((X[:n0] - X[n0:]) ** 2, axis=1)))
    out = {"config": "bench north-star (m=50, S=5, template view 0)",
           "epochs": args.epochs, "observed_error": obs_err, "rows": []}
    for seed in range(args.seeds):
        e_sq, l_sq = run(seed, False)
        e_tr, l_tr = run(seed, True)
        out["rows"].append({
            "seed": seed,
            "square": {"aligned_error": e_sq, "tail_loss": l_sq},
            "triangular": {"aligned_error": e_tr, "tail_loss": l_tr},
        })
        print(json.dumps(out["rows"][-1]), flush=True)
    sq = [r["square"]["aligned_error"] for r in out["rows"]]
    tr = [r["triangular"]["aligned_error"] for r in out["rows"]]
    out["summary"] = {
        "square_median_error": float(np.median(sq)),
        "triangular_median_error": float(np.median(tr)),
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "bench_variational_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["summary"], indent=2))


if __name__ == "__main__":
    main()
