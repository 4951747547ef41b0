"""Attribute the multistart robustness tail: early stopping, selection, or basins?

The round-4 adaptive-wave sweep (experiments/out/
accuracy_robustness_restarts16_consistency_adaptive4.json) left 4 of 10
seeds above the 1e-3 worst-case de-novo bar (1.3-2.3e-3). Three distinct
mechanisms could produce that tail, and they demand different fixes:

  (a) EARLY STOPPING — the adaptive policy stopped before a sub-1e-3
      restart would have been trained (fix: larger waves / tighter rtol);
  (b) SELECTION ERROR — a sub-1e-3 restart WAS trained but consistency
      ranked another restart above it (fix: better selection score);
  (c) BASIN STRUCTURE — no restart of the 16 lands below 1e-3 on these
      draws (fix: none of the above; the draw's optimum under this
      objective is simply there).

This harness disambiguates by training ALL 16 restarts (vectorized, same
init seeds ``seed*100 + r`` the sweep used) on the tail seeds, recording
every restart's TRUE aligned-view error (simulation ground truth) next to
its consistency score, then REPLAYING the adaptive wave rule (waves of 4,
rtol 0.05, min two waves) on the recorded scores to find what the sweep
actually saw.

Reference context: the recorded single-draw oracle is 5.4e-4
(/root/reference/experiments/simulations/two_dimensional_denovo_vs_templatebased.py:234-236).

Run: python experiments/simulations/robustness_tail_diagnosis.py --seeds 4 5 7 9
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data
from spatial_alignment_tpu.models.vgpsa import _resolve_recipe


def view_error(coords, view_idx):
    return float(
        np.mean(np.sum((coords[view_idx[0]] - coords[view_idx[1]]) ** 2, axis=1))
    )


def replay_adaptive(scores, wave=4, rtol=0.05):
    """Number of restarts the adaptive rule would train given these scores."""
    done, best_prev = 0, np.inf
    n = len(scores)
    while done < n:
        done += min(wave, n - done)
        best_now = min(scores[:done])
        if done >= n:
            break
        if np.isfinite(best_prev) and best_now >= best_prev * (1.0 - rtol):
            break
        best_prev = best_now
    return done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[4, 5, 7, 9])
    ap.add_argument("--restarts", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=10000)
    ap.add_argument("--wave", type=int, default=4)
    ap.add_argument("--rtol", type=float, default=0.05)
    ap.add_argument("--init", default="random",
                    choices=["random", "prealign", "ot", "mixed"],
                    help="restart init-diversity family; each restart row "
                    "records its family so basin floors can be attributed "
                    "per family (VERDICT r4 item 2)")
    ap.add_argument("--out-name", default="robustness_tail_diagnosis.json")
    args = ap.parse_args()

    per_seed = []
    for seed in args.seeds:
        rng = np.random.default_rng(seed)
        X, Y, nsl, view_idx = generate_twod_data(
            2, 30, grid_size=10, n_latent_gps=5, kernel_lengthscale=5.0,
            kernel_variance=0.5, noise_variance=0.001, fixed_view_idx=0,
            rng=rng,
        )
        X32, Y32 = X.astype(np.float32), Y.astype(np.float32)
        data_dict = {
            "expression": {
                "spatial_coords": X32, "outputs": Y32, "n_samples_list": nsl,
            }
        }
        model = VariationalGPSA(
            data_dict, m_X_per_view=50, m_G=50,
            n_latent_gps={"expression": 5}, mean_function="identity_fixed",
            fixed_view_idx=None, seed=seed,
        )
        vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
        opt, temps = _resolve_recipe("accurate", 1e-2, args.epochs, None, None)

        # Per-restart init families (mirrors fit_multistart's cycle).
        families = ["random"] * args.restarts
        init_transforms = None
        if args.init != "random":
            seeds_t = {}
            if args.init in ("prealign", "mixed"):
                seeds_t["prealign"] = model._warp_init_transforms("prealign")
            if args.init in ("ot", "mixed"):
                seeds_t["ot"] = model._warp_init_transforms("ot")
            if args.init == "mixed":
                cyc = [("random", None),
                       ("prealign", seeds_t["prealign"]),
                       ("ot", seeds_t["ot"])]
            else:
                cyc = [(args.init, seeds_t[args.init])]
            families = [cyc[r % len(cyc)][0] for r in range(args.restarts)]
            init_transforms = [
                cyc[r % len(cyc)][1] for r in range(args.restarts)
            ]

        t0 = time.time()
        params_R, _ = model._fit_restarts_vectorized(
            args.epochs, args.restarts, seed * 100,
            lr=1e-2, S=5, optimizer=opt, warp_temperature_schedule=temps,
            init_transforms=init_transforms,
        )
        train_s = time.time() - t0

        restarts = []
        for r in range(args.restarts):
            model.params = jax.tree.map(lambda x, r=r: x[r], params_R)
            G_means, _, _, _ = model.forward({"expression": X32}, vi, Ns)
            Ga = np.asarray(G_means["expression"])
            restarts.append({
                "restart": r,
                "family": families[r],
                "error": view_error(Ga, view_idx),
                "consistency": model._alignment_consistency(
                    {"expression": Ga}
                ),
                "G": Ga,
            })

        scores = [r["consistency"] for r in restarts]
        errors = [r["error"] for r in restarts]
        n_seen = replay_adaptive(scores, args.wave, args.rtol)
        seen = restarts[:n_seen]
        pick_seen = min(seen, key=lambda r: r["consistency"])
        pick_all = min(restarts, key=lambda r: r["consistency"])
        top2_seen = sorted(seen, key=lambda r: r["consistency"])[:2]
        ens2_seen = view_error(
            np.mean([r["G"] for r in top2_seen], axis=0), view_idx
        )
        top2_all = sorted(restarts, key=lambda r: r["consistency"])[:2]
        ens2_all = view_error(
            np.mean([r["G"] for r in top2_all], axis=0), view_idx
        )
        # Ensemble-size sweep: averaging aligned coords across the top-k
        # consistency-ranked restarts cancels independent basin error (the
        # top-2 ensemble beats every SINGLE restart on the tail seeds) —
        # measure how far k pushes below the per-restart floor.
        ranked = sorted(restarts, key=lambda r: r["consistency"])
        ens_by_k = {
            str(k): float(view_error(
                np.mean([r["G"] for r in ranked[:k]], axis=0), view_idx
            ))
            for k in (1, 2, 3, 4, 6, 8, 12, 16) if k <= len(ranked)
        }
        for r in restarts:
            del r["G"]

        row = {
            "seed": seed,
            "observed_error": view_error(X32, view_idx),
            "train_seconds": train_s,
            "adaptive_restarts_seen": n_seen,
            "best_possible_all16": float(min(errors)),
            "best_possible_seen": float(min(r["error"] for r in seen)),
            "consistency_pick_seen": float(pick_seen["error"]),
            "consistency_pick_all16": float(pick_all["error"]),
            "top2_ensemble_seen": float(ens2_seen),
            "top2_ensemble_all16": float(ens2_all),
            "spearman_consistency_vs_error": float(
                _spearman(scores, errors)
            ),
            "ensemble_error_by_k": ens_by_k,
            "best_by_family": {
                fam: float(min(r["error"] for r in restarts
                               if r["family"] == fam))
                for fam in sorted(set(families))
            },
            "restarts": restarts,
        }
        print(json.dumps({k: v for k, v in row.items() if k != "restarts"},
                         indent=2), flush=True)
        per_seed.append(row)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, args.out_name), "w") as f:
        json.dump({
            "config": vars(args),
            "note": "tail seeds from accuracy_robustness_restarts16_"
                    "consistency_adaptive4.json; mechanisms: (a) early "
                    "stopping if best_possible_all16 << best_possible_seen, "
                    "(b) selection error if consistency_pick_seen >> "
                    "best_possible_seen, (c) basin structure if "
                    "best_possible_all16 is itself above the bar",
            "rows": per_seed,
        }, f, indent=2)


def _spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / d) if d else 0.0


if __name__ == "__main__":
    main()
