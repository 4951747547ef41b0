"""Step through the epoch-4119 loss cliff at the m=200 / N=4k config.

nan_diagnose.py located a deterministic cliff: loss -73k -> +1.7e7 within a
couple of steps around epoch 4119 with bounded parameters (seed 1, plain Adam
lr=1e-2). This harness trains to just before the cliff, checkpoints, and then
resumes one epoch at a time (bit-identical resume) while recording, for every
Cholesky in the model:
  * the jitter-escalation branch chosen by ops.linalg.jittered_cholesky
    (base / 100x / 10000x) for each warp-view Kuu and the data Kuu,
  * float64 eigenvalue extrema of the underlying Gram matrices,
  * the loss.
If the cliff coincides with a probe-branch flip, the discontinuous jitter is
the mechanism; if eigenvalues pass through zero faster than the ladder can
absorb, the ladder is the mechanism.

Run: python experiments/simulations/cliff_introspect.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import generate_twod_data
from spatial_alignment_tpu.ops.kernels import get_kernel


def gram_health(mat, eps):
    """Probe branches + f64 eigen extrema for one (m, m) Gram matrix.

    Matches the model's numerics: the Gram is built (by the caller) and
    factorized under matmul precision "highest", exactly as core.forward
    does — measuring with the platform-default bf16 matmuls would report
    spurious indefiniteness.
    """
    m = np.asarray(mat, np.float64)
    diag_mean = max(1.0, float(np.mean(np.diag(m))))
    base = eps * diag_mean

    def probe_ok(jit):
        with jax.default_matmul_precision("highest"):
            eye = jnp.eye(mat.shape[0], dtype=jnp.float32)
            L = jnp.linalg.cholesky(jnp.asarray(mat, jnp.float32) + jit * eye)
        return not np.isnan(np.asarray(L)).any()

    ok1 = probe_ok(base)
    ok2 = probe_ok(100 * base)
    ok3 = probe_ok(10000 * base)
    w = np.linalg.eigvalsh(m)
    return {
        "branch": 0 if ok1 else (1 if ok2 else 2),
        "ladder_exhausted": not (ok1 or ok2 or ok3),
        "eig_min": float(w[0]),
        "eig_max": float(w[-1]),
        "diag_mean": diag_mean,
        "base_jitter": base,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--prec", default="high")
    ap.add_argument("--pre-epochs", type=int, default=4110)
    ap.add_argument("--post-epochs", type=int, default=30)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--grid-size", type=int, default=45)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    X, Y, nsl, view_idx = generate_twod_data(
        2, 30, grid_size=args.grid_size, n_latent_gps=10,
        kernel_lengthscale=5.0, kernel_variance=0.5,
        noise_variance=0.001, fixed_view_idx=0, rng=rng,
    )
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    dd = {"expression": {"spatial_coords": X, "outputs": Y,
                         "n_samples_list": nsl}}
    model = VariationalGPSA(
        dd, m_X_per_view=args.m, m_G=args.m,
        n_latent_gps={"expression": 10}, fixed_view_idx=0,
        seed=args.seed, svgp_matmul_precision=args.prec,
    )

    out_dir = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, f"cliff_s{args.seed}_{args.prec}.npz")

    if not os.path.exists(ckpt):
        print(f"training {args.pre_epochs} epochs to just before the cliff...",
              flush=True)
        model.fit(n_epochs=args.pre_epochs, lr=1e-2, S=5, print_every=1000)
        model.save(ckpt)

    spec = model.spec
    eps = spec.diagonal_offset
    kern_w = get_kernel(spec.kernel_warp)
    kern_d = get_kernel(spec.kernel_data)
    rows = []

    def diag_cb(m, epoch, losses):
        hp = dict(m.consts)
        hp.update(m.params)
        row = {"epoch": int(args.pre_epochs + epoch),
               "loss": float(losses[-1])}
        with jax.default_matmul_precision("highest"):
            Kuus = [
                kern_w(hp["Xtilde"][v], hp["Xtilde"][v],
                       hp["warp_kernel_lengthscales"][v],
                       hp["warp_kernel_variances"][v])
                for v in range(spec.n_views)
            ]
            Kdd = kern_d(hp["Gtilde"], hp["Gtilde"],
                         hp["data_kernel_lengthscale"],
                         hp["data_kernel_variance"])
        for v, Kuu in enumerate(Kuus):
            row[f"warp_view{v}"] = gram_health(Kuu, eps)
        row["data"] = gram_health(Kdd, eps)
        rows.append(row)
        print(json.dumps(row), flush=True)

    model.fit(n_epochs=args.post_epochs, lr=1e-2, S=5, print_every=1,
              callback=diag_cb, resume_from=ckpt)

    path = os.path.join(out_dir, "cliff_introspect.json")
    with open(path, "w") as f:
        json.dump({"pre_epochs": args.pre_epochs, "rows": rows}, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
