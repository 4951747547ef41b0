"""Four-layer Spatial Transcriptomics stack alignment (template view 1).

TPU-native port of
/root/reference/experiments/expression/st/st_alignment.py:61-66,197-235:
four serial breast-cancer sections aligned into the frame of slice 2
(fixed_view_idx=1), aligned coordinates dumped to CSV mid-/post-training.

Data: pass four ST-format CSVs (genes in columns, 'AxB' spot index) via
--csv; otherwise a structure-matched synthetic 4-slice stand-in is used.

Run: python experiments/expression/st/st_alignment.py [--epochs 2000]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu import VariationalGPSA
from spatial_alignment_tpu.data import load_st_data, synthetic_st_like
from spatial_alignment_tpu.utils import deviance_feature_selection

M = 50
N_GENES = 20
FIXED_VIEW_IDX = 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", nargs=4, default=None)
    ap.add_argument("--epochs", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.csv:
        coords_list, counts_list, _ = load_st_data(args.csv, n_genes=200)
        source = "real"
        # count preprocessing: deviance feature selection on pooled counts
        import pandas as pd

        pooled = pd.DataFrame(np.concatenate(counts_list).T)
        devs, _ = deviance_feature_selection(pooled)
        keep = np.argsort(-devs)[:N_GENES]
        counts_list = [np.log1p(c[:, keep]) for c in counts_list]
    else:
        coords_list, counts_list = synthetic_st_like(n_slices=4, seed=args.seed)
        source = "synthetic stand-in"

    coords_list = [
        10 * (c - c.min(0)) / (c.max(0) - c.min(0)) for c in coords_list
    ]
    Y_all = np.concatenate(counts_list)
    mu, sd = Y_all.mean(0), Y_all.std(0) + 1e-8
    counts_list = [(y - mu) / sd for y in counts_list]

    X = np.concatenate(coords_list).astype(np.float32)
    Y = np.concatenate(counts_list).astype(np.float32)
    n_samples_list = [c.shape[0] for c in coords_list]

    data_dict = {
        "expression": {
            "spatial_coords": X,
            "outputs": Y,
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=M,
        m_G=M,
        n_latent_gps={"expression": 10},
        fixed_view_idx=FIXED_VIEW_IDX,
        seed=args.seed,
    )
    vi, Ns, _, _ = model.create_view_idx_dict(data_dict)
    losses = model.fit(n_epochs=args.epochs, lr=1e-2, S=5, print_every=500)

    G_means, _, _, _ = model.forward({"expression": X}, vi, Ns)
    aligned = G_means["expression"]

    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    np.savetxt(os.path.join(out_dir, "aligned_coords_st.csv"), aligned, delimiter=",")
    np.savetxt(os.path.join(out_dir, "X_st.csv"), X, delimiter=",")

    summary = {
        "source": source,
        "n_views": len(n_samples_list),
        "final_loss": float(losses[-1]),
    }
    if len(set(n_samples_list)) == 1:
        # matched spots across slices -> mean error to the template slice
        vi_np = [np.asarray(v) for v in vi["expression"]]
        pre = np.mean(
            [
                np.mean(np.sum((X[vi_np[FIXED_VIEW_IDX]] - X[vi_np[v]]) ** 2, axis=1))
                for v in range(4)
                if v != FIXED_VIEW_IDX
            ]
        )
        post = np.mean(
            [
                np.mean(
                    np.sum(
                        (aligned[vi_np[FIXED_VIEW_IDX]] - aligned[vi_np[v]]) ** 2, axis=1
                    )
                )
                for v in range(4)
                if v != FIXED_VIEW_IDX
            ]
        )
        summary["pre_error"] = float(pre)
        summary["post_error"] = float(post)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
