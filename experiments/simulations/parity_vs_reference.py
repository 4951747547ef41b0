"""Head-to-head accuracy parity vs the torch reference on identical data.

Reproduces the round-1 comparison: a two-view 10x10 grid, 30 outputs, L=5
LMC, warp kernel variance 0.5, noise 0.001, de-novo alignment, m=50, S=5,
Adam lr 1e-2 (reference experiment pattern:
/root/reference/experiments/simulations/two_dimensional_denovo_vs_templatebased.py).
The dataset is generated once from a fixed seed and fed to both frameworks.

Error metric = mean over spots of the summed squared per-dimension difference
between the two views' aligned coordinates (lower = tighter alignment).

Variants (ours):
  plain        exact ELBO, final iterate
  refscale     reference_sample_scale=True (replicates the reference's
               variance-as-stddev warp sampling, vgpsa.py:334-340 — its
               samples carry far less noise once var < 1, which acts as
               annealing)
  avg          tail parameter averaging (fit(average_last=...))
  refscale+avg both

Run:  python experiments/simulations/parity_vs_reference.py [--epochs 3000]
      [--variants plain,refscale,avg,refscale+avg] [--run-torch] [--seed 0]
Writes experiments/out/parity_vs_reference.json (merging existing keys).
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

OUT_PATH = os.path.join(os.path.dirname(__file__), "..", "out", "parity_vs_reference.json")

# Recorded round-1 measurement of the reference on this exact dataset
# (torch 2.x CPU, 3000 epochs, seed 0): see STATUS.md round-1 table.
TORCH_RECORDED_3000 = 0.0013558


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    X, Y, n_samples_list, view_idx = generate_twod_data(
        n_views=2,
        n_outputs=30,
        grid_size=10,
        n_latent_gps=5,
        kernel_lengthscale=5.0,
        kernel_variance=0.5,
        noise_variance=0.001,
        fixed_view_idx=0,
        rng=rng,
    )
    return X.astype(np.float32), Y.astype(np.float32), n_samples_list, view_idx


def view_error(coords, view_idx):
    return float(np.mean(np.sum((coords[view_idx[0]] - coords[view_idx[1]]) ** 2, axis=1)))


def run_ours(
    X, Y, n_samples_list, view_idx, n_epochs, seed,
    *, refscale=False, average_last=None, lr_decay=False, S=5, temp_anneal=False,
):
    data_dict = {
        "expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}
    }
    model = VariationalGPSA(
        data_dict,
        n_spatial_dims=2,
        m_X_per_view=50,
        m_G=50,
        data_init=True,
        n_latent_gps={"expression": 5},
        mean_function="identity_fixed",
        seed=seed,
        reference_sample_scale=refscale,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    optimizer = None
    if lr_decay:
        import optax

        # Anneal the Adam step so the late-training SVI noise ball shrinks
        # (the reference gets this accidentally from its sample-scale bug).
        sched = optax.cosine_decay_schedule(1e-2, n_epochs, alpha=1e-2)
        optimizer = optax.adam(sched)
    temps = None
    if temp_anneal == "zero":
        # deterministic warp throughout (temperature-0 ELBO: the likelihood
        # sees the posterior-mean warp; the KL still regularizes)
        temps = lambda t: np.zeros_like(np.asarray(t, np.float32))
    elif temp_anneal:
        # cosine warp-noise temperature 1 -> 0: approaches the deterministic
        # warp the reference's sample-scale bug reaches late in training
        temps = lambda t: 0.5 * (1 + np.cos(np.pi * np.asarray(t) / n_epochs))
    t0 = time.time()
    losses = model.fit(
        n_epochs=n_epochs, lr=1e-2, S=S,
        average_last=average_last, optimizer=optimizer,
        warp_temperature_schedule=temps,
    )
    wall = time.time() - t0
    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    err = view_error(np.asarray(G_means["expression"]), view_idx)
    return err, float(losses[-1]), wall


def run_torch_reference(X, Y, n_samples_list, view_idx, n_epochs):
    """Run the torch reference as shipped on the same arrays."""
    import warnings

    warnings.filterwarnings("ignore")
    sys.path.insert(0, "/root/reference")
    import torch
    from gpsa import VariationalGPSA as RefModel

    x = torch.from_numpy(X).float()
    y = torch.from_numpy(Y).float()
    data_dict = {
        "expression": {"spatial_coords": x, "outputs": y, "n_samples_list": n_samples_list}
    }
    model = RefModel(
        data_dict,
        n_spatial_dims=2,
        m_X_per_view=50,
        m_G=50,
        data_init=True,
        minmax_init=False,
        grid_init=False,
        n_latent_gps={"expression": 5},
        mean_function="identity_fixed",
        fixed_view_idx=None,
    )
    view_idx_t, Ns, _, _ = model.create_view_idx_dict(data_dict)
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    t0 = time.time()
    for _ in range(n_epochs):
        model.train()
        opt.zero_grad()
        G_means, G_samples, F_latent_samples, F_samples = model.forward(
            {"expression": x}, view_idx_t, Ns, S=5
        )
        loss = model.loss_fn(data_dict, F_samples)
        loss.backward()
        opt.step()
    wall = time.time() - t0
    model.eval()
    G_means, *_ = model.forward({"expression": x}, view_idx_t, Ns, S=1)
    aligned = G_means["expression"].detach().numpy()
    return view_error(aligned, view_idx), float(loss.item()), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variants", default="plain,refscale,avg,refscale+avg")
    ap.add_argument("--run-torch", action="store_true")
    ap.add_argument("--tag", default=None, help="suffix for result keys")
    args = ap.parse_args()

    X, Y, n_samples_list, view_idx = make_data(args.seed)
    pre = view_error(X, view_idx)
    print(f"observed (pre-alignment) error: {pre:.6f}")

    results = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            results = json.load(f)
    results["observed_error_pre_alignment"] = pre
    results.setdefault("torch_reference_3000_epochs", TORCH_RECORDED_3000)

    if args.run_torch:
        err, loss, wall = run_torch_reference(X, Y, n_samples_list, view_idx, args.epochs)
        key = f"torch_reference_{args.epochs}_epochs_measured"
        results[key] = err
        print(f"torch {args.epochs} epochs: err={err:.6f} loss={loss:.1f} ({wall:.0f}s)")

    for variant in [v.strip() for v in args.variants.split(",") if v.strip()]:
        refscale = "refscale" in variant
        avg = args.epochs // 3 if "avg" in variant else None
        err, loss, wall = run_ours(
            X, Y, n_samples_list, view_idx, args.epochs, args.seed,
            refscale=refscale, average_last=avg,
            lr_decay="lrdecay" in variant,
            S=20 if "S20" in variant else 5,
            temp_anneal="zero" if "temp0" in variant else ("temp" in variant),
        )
        key = f"ours_{variant}_{args.epochs}_epochs"
        if args.tag:
            key += f"_{args.tag}"
        results[key] = err
        print(f"ours[{variant}] {args.epochs} epochs: err={err:.6f} loss={loss:.1f} ({wall:.0f}s)")

    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if isinstance(v, float)}, indent=2))


if __name__ == "__main__":
    main()
