"""Which restart-selection criterion tracks true alignment error?

fit_multistart must pick one of R restarts WITHOUT ground truth. Round-2
used tail training loss, which mis-ranks because the ELBO decouples from
view-overlap error near convergence (experiments/out/parity_trajectory.json);
round-3's first attempt (train each restart on a 90% split, score held-out
predictive likelihood, retrain the winning seed on full data) broke the
score→outcome link — the full-data retrain lands in a different basin than
the scored 90% run (measured: median 2.4e-3 vs tail-loss's 6.9e-4).

This harness trains R restarts per difficulty-matched draw on the FULL data
(so scored run == kept run), records each restart's TRUE aligned-view error
(simulation ground truth), and scores every restart under candidate
criteria computable without ground truth:

  * tail_loss     mean training loss over the last 200 epochs (round-2)
  * elbo64        exact (temperature-1) negative ELBO, S=64, fixed key
  * consistency   cross-view expression disagreement: inverse-distance
                  k-NN interpolation of every other view's expression at
                  each point's aligned coordinates (a misaligned restart
                  puts disagreeing spots next to each other)

Also evaluates aligned-coordinate ENSEMBLES (averaging G_means over the
top-k restarts under each criterion): restart errors are partly independent
displacements, so averaging can beat every individual restart.

Run: python experiments/simulations/restart_selection_ab.py --draws 35 30 25 34 27
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data

ORACLE_DENOVO = 0.000536963  # reference-recorded single-draw oracle


def draw(seed):
    rng = np.random.default_rng(seed)
    return generate_twod_data(
        2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
        kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )


def view_error(coords, view_idx):
    return float(
        np.mean(np.sum((coords[view_idx[0]] - coords[view_idx[1]]) ** 2, axis=1))
    )


def consistency_score(Ga, Y, view_idx, k=5):
    """Cross-view k-NN expression disagreement in aligned coordinates
    (lower = better aligned). Needs no ground truth."""
    from scipy.spatial import cKDTree

    errs = []
    n_views = len(view_idx)
    for a in range(n_views):
        for b in range(n_views):
            if a == b:
                continue
            tree = cKDTree(Ga[view_idx[b]])
            d, j = tree.query(Ga[view_idx[a]], k=k)
            w = 1.0 / np.maximum(d, 1e-9)
            w /= w.sum(axis=1, keepdims=True)
            yhat = (Y[view_idx[b]][j] * w[..., None]).sum(axis=1)
            errs.append(float(np.mean((Y[view_idx[a]] - yhat) ** 2)))
    return float(np.mean(errs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draws", type=int, nargs="+", default=[35, 30, 25, 34, 27])
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=10000)
    args = ap.parse_args()

    per_draw = []
    for seed in args.draws:
        X, Y, n_samples_list, view_idx = draw(seed)
        X32, Y32 = X.astype(np.float32), Y.astype(np.float32)
        data_dict = {
            "expression": {
                "spatial_coords": X32, "outputs": Y32,
                "n_samples_list": n_samples_list,
            }
        }
        model = VariationalGPSA(
            data_dict, m_X_per_view=50, m_G=50,
            n_latent_gps={"expression": 5}, mean_function="identity_fixed",
            fixed_view_idx=None, seed=seed,
        )
        vi, Ns, _, _ = model.create_view_idx_dict(data_dict)

        restarts = []
        for r in range(args.restarts):
            model.reinitialize(seed * 100 + r)
            t0 = time.time()
            losses = model.fit(
                n_epochs=args.epochs, lr=1e-2, S=5, recipe="accurate"
            )
            G_means, _, _, _ = model.forward({"expression": X32}, vi, Ns)
            Ga = np.asarray(G_means["expression"])
            import jax

            rec = {
                "restart": r,
                "error": view_error(Ga, view_idx),
                "tail_loss": float(np.mean(losses[-200:])),
                "elbo64": float(model.neg_elbo(S=64, key=jax.random.PRNGKey(0))),
                "consistency": consistency_score(Ga, Y, view_idx),
                "seconds": time.time() - t0,
            }
            restarts.append((rec, Ga))
            print(
                f"seed {seed} r{r}: err {rec['error']:.6f} tail {rec['tail_loss']:.1f} "
                f"elbo64 {rec['elbo64']:.1f} cons {rec['consistency']:.5f} "
                f"({rec['seconds']:.0f}s)", flush=True,
            )

        recs = [r for r, _ in restarts]
        Gas = np.stack([g for _, g in restarts])
        errors = np.array([r["error"] for r in recs])

        def pick(crit):
            return int(np.argmin([r[crit] for r in recs]))

        def topk_ensemble(crit, k):
            order = np.argsort([r[crit] for r in recs])[:k]
            return view_error(Gas[order].mean(axis=0), view_idx)

        analysis = {
            "seed": seed,
            "errors": errors.tolist(),
            "best_possible": float(errors.min()),
            "median_restart": float(np.median(errors)),
            "picks": {
                c: {"restart": pick(c), "error": float(errors[pick(c)])}
                for c in ("tail_loss", "elbo64", "consistency")
            },
            "ensembles": {
                f"{c}_top{k}": topk_ensemble(c, k)
                for c in ("tail_loss", "elbo64", "consistency")
                for k in (2, 4)
            },
            "ensemble_all": float(view_error(Gas.mean(axis=0), view_idx)),
            "oracle_top2_ensemble": float(
                view_error(Gas[np.argsort(errors)[:2]].mean(axis=0), view_idx)
            ),
            "restarts": recs,
        }
        per_draw.append(analysis)
        print(json.dumps({k: v for k, v in analysis.items() if k != "restarts"},
                         indent=2), flush=True)

    summary = {
        "reference_oracle_denovo": ORACLE_DENOVO,
        "n_restarts": args.restarts,
        "n_epochs": args.epochs,
        "medians": {
            "best_possible": float(np.median([d["best_possible"] for d in per_draw])),
            **{
                c: float(np.median([d["picks"][c]["error"] for d in per_draw]))
                for c in ("tail_loss", "elbo64", "consistency")
            },
            **{
                e: float(np.median([d["ensembles"][e] for d in per_draw]))
                for e in per_draw[0]["ensembles"]
            },
            "ensemble_all": float(np.median([d["ensemble_all"] for d in per_draw])),
        },
        "per_draw": per_draw,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "restart_selection_ab.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["medians"], indent=2))


if __name__ == "__main__":
    main()
