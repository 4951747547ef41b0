"""Throughput at 100k spots: the chunked data layer's headline demo.

Unchunked, the data-layer variance intermediate at this scale would be
S*L*N*m * 4B = 5*10*100k*100*4B = 2 TB-scale over the backward pass; with
``data_chunk_size`` it runs in bounded memory on one chip.

Run: python experiments/simulations/extreme_scale.py [--n-per-view 50000]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-per-view", type=int, default=50000)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--genes", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--precision", choices=["highest", "high"], default="highest",
                    help="svgp_matmul_precision: 'high' = bf16 3-pass MXU "
                    "for the O(m^2 N) projections (the FLOP peak here)")
    ap.add_argument("--variational", choices=["square", "triangular"],
                    default="square")
    ap.add_argument("--minibatch", type=int, default=None,
                    help="SVI minibatch size per view: per-step cost becomes "
                    "independent of N (core.negative_elbo_minibatch)")
    ap.add_argument("--train-steps", type=int, default=0,
                    help="after timing, train this many further steps and "
                    "record the aligned-view error before/after")
    ap.add_argument("--recipe", choices=["plain", "accurate"], default="plain",
                    help="training recipe for --train-steps: 'accurate' = "
                    "cosine lr decay + temperature-0 warp objective")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X1 = rng.uniform(0, 10, (args.n_per_view, 2)).astype(np.float32)
    # analytic smooth warp (O(N) host cost at this scale)
    warp = 0.4 * np.stack(
        [np.sin(X1[:, 0] / 2.0 + 1.0), np.cos(X1[:, 1] / 2.0)], 1
    ).astype(np.float32)
    X = np.concatenate([X1, X1 + warp])
    Y1 = np.stack(
        [np.sin(X1[:, 0] * (j % 3 + 1) / 3.0) + np.cos(X1[:, 1] * (j % 2 + 1) / 2.0)
         for j in range(args.genes)], 1,
    ).astype(np.float32)
    Y = np.concatenate([Y1, Y1])

    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                          "n_samples_list": [args.n_per_view] * 2}}
    t0 = time.time()
    model = VariationalGPSA(
        dd, m_X_per_view=args.m, m_G=args.m,
        n_latent_gps={"expression": args.genes}, fixed_view_idx=0,
        data_chunk_size=args.chunk, seed=args.seed,
        svgp_matmul_precision=args.precision,
        triangular_variational=(args.variational == "triangular"),
    )
    print(f"constructed (kmeans init) in {time.time()-t0:.0f}s", flush=True)

    loop, opt_state = model.make_train_loop(lr=1e-2, S=5, minibatch_size=args.minibatch)
    carry = (model.params, opt_state, jax.random.PRNGKey(0))
    chunk_steps = 20 if args.minibatch is None else 200
    t0 = time.time()
    carry, losses = loop(carry, chunk_steps)
    losses.block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    carry, losses = loop(carry, chunk_steps)
    losses.block_until_ready()
    dt = time.time() - t0

    out = {
        "n_spots_total": int(X.shape[0]),
        "m": args.m,
        "data_chunk_size": args.chunk,
        "compile_seconds": compile_s,
        "steps_per_sec": chunk_steps / dt,
        "final_loss_finite": bool(np.isfinite(float(losses[-1]))),
        "final_loss": float(losses[-1]),
        "platform": jax.devices()[0].platform,
        "svgp_matmul_precision": args.precision,
        "variational": args.variational,
        "minibatch": args.minibatch,
    }

    if args.train_steps:
        n = args.n_per_view

        def aligned_error(params):
            model.params = jax.tree.map(lambda a: a + 0, params)
            G, _, _ = model.predict({"expression": X})
            g = G["expression"]
            return float(np.mean(np.sum((g[:n] - g[n:]) ** 2, axis=1)))

        out["recipe"] = args.recipe
        out["observed_error"] = float(np.mean(np.sum(warp**2, axis=1)))
        out["aligned_error_at_timing_end"] = aligned_error(carry[0])
        # Both recipes train exactly --train-steps FURTHER steps, warm-started
        # from the post-timing parameters; the timing steps are recorded
        # separately so recipe A/Bs compare equal optimization budgets.
        out["warm_start_steps"] = 2 * chunk_steps
        t0 = time.time()
        if args.recipe == "accurate":
            # Converged-accuracy recipe (fit(recipe="accurate"): cosine lr
            # decay + temperature-0 warp objective). The exact-ELBO objective
            # decouples from view-overlap error once the data GP is flexible
            # enough; this recipe keeps alignment converging monotonically.
            model.params = jax.tree.map(lambda a: a + 0, carry[0])
            model.fit(
                args.train_steps,
                S=5,
                minibatch_size=args.minibatch,
                recipe="accurate",
                chunk_size=chunk_steps,
            )
            final_params = model.params
            trained = args.train_steps
        else:
            trained = 0
            while trained < args.train_steps:
                carry, losses = loop(carry, chunk_steps)  # fixed shape: jit-cached
                trained += chunk_steps
            losses.block_until_ready()
            final_params = carry[0]
        out["train_steps_total"] = trained
        out["train_seconds"] = time.time() - t0
        out["aligned_error_final"] = aligned_error(final_params)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    suffix = "" if (args.precision, args.variational) == ("highest", "square") else (
        f"_{args.precision}_{args.variational}"
    )
    if args.minibatch is not None:
        suffix += f"_mb{args.minibatch}"
    if args.recipe != "plain":
        suffix += f"_{args.recipe}"
    if args.n_per_view != 50000:
        suffix += f"_n{args.n_per_view}"
    with open(os.path.join(out_dir, f"extreme_scale{suffix}.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
