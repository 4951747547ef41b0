"""K-fold GPR prediction from SAVED aligned coordinates.

Port of /root/reference/experiments/expression/visium/
visium_prediction_from_saved.py: load the alignment artifacts written by
visium_alignment.py and compare 3-fold GPR prediction R^2 using the aligned
vs the observed pooled coordinates — alignment should make the pooled data
more predictable.

Run: python experiments/expression/visium/visium_prediction_from_saved.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")


def main():
    needed = [
        os.path.join(OUT_DIR, f)
        for f in ("X_visium.csv", "Y_visium.csv", "aligned_coords_visium.csv")
    ]
    if not all(os.path.exists(p) for p in needed):
        print("artifacts missing -> running visium_alignment inline")
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "visium_alignment.py")],
            check=True,
        )

    X = np.loadtxt(needed[0], delimiter=",")
    Y = np.loadtxt(needed[1], delimiter=",")
    aligned = np.loadtxt(needed[2], delimiter=",")

    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, WhiteKernel
    from sklearn.metrics import r2_score
    from sklearn.model_selection import KFold

    r2_aligned, r2_unaligned = [], []
    for train_index, test_index in KFold(n_splits=3).split(aligned):
        for coords, sink in ((aligned, r2_aligned), (X, r2_unaligned)):
            gpr = GaussianProcessRegressor(WhiteKernel() + RBF())
            gpr.fit(coords[train_index], Y[train_index])
            preds = gpr.predict(coords[test_index])
            sink.append(float(r2_score(Y[test_index], preds)))

    out = {
        "r2_aligned_per_fold": r2_aligned,
        "r2_unaligned_per_fold": r2_unaligned,
        "r2_aligned_mean": float(np.mean(r2_aligned)),
        "r2_unaligned_mean": float(np.mean(r2_unaligned)),
    }
    with open(os.path.join(OUT_DIR, "prediction_from_saved.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
