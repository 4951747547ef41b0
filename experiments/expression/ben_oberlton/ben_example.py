"""Cell-table example: two cell types as views.

Port of /root/reference/experiments/expression/ben_oberlton/ben_example.py:
27-62 (user-contributed immune/tumor example): a single cell table with a
cell-type column is split into two "views" and aligned.

Data: --csv table with [x, y, cell_type, feature...] columns; otherwise a
synthetic stand-in.

Run: python experiments/expression/ben_oberlton/ben_example.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.csv:
        import pandas as pd

        df = pd.read_csv(args.csv)
        types = df["cell_type"].unique()[:2]
        views = [df[df.cell_type == t] for t in types]
        coords = [v[["x", "y"]].to_numpy(float) for v in views]
        feats = [
            v.drop(columns=["x", "y", "cell_type"]).to_numpy(float) for v in views
        ]
    else:
        rng = np.random.default_rng(args.seed)
        n = 150
        base = rng.uniform(0, 10, (n, 2))
        f = np.stack([np.sin(base[:, 0]), np.cos(base[:, 1]), base.sum(1) / 5], 1)
        coords = [base, base + 0.3 * rng.standard_normal((n, 2))]
        feats = [f, f + 0.05 * rng.standard_normal(f.shape)]

    X = np.concatenate(coords).astype(np.float32)
    Y = np.concatenate(feats).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords]
    data_dict = {
        "expression": {"spatial_coords": X, "outputs": Y, "n_samples_list": n_samples_list}
    }
    model = VariationalGPSA(
        data_dict, m_X_per_view=25, m_G=25,
        n_latent_gps={"expression": None}, fixed_view_idx=0, seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5)
    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    print(
        json.dumps(
            {
                "final_loss": float(losses[-1]),
                "aligned_shape": list(G_means["expression"].shape),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
