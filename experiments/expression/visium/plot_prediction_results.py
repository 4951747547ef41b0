"""Standalone Visium prediction-results replot from saved CSVs.

Port of /root/reference/experiments/expression/visium/
plot_prediction_results.py:1-100 — a saved-CSV -> figure tool: it reads
per-gene R^2 tables for three methods (GPSA, Union-GPR, Separate-GPR;
trials x genes) and draws a two-panel figure: (left) boxplot of per-trial
mean R^2, GPSA vs Union; (right) per-gene mean +/- std scatter of GPSA R^2
against Union R^2 with the y = x line.

The reference assumes ``prediction_errors_{gpsa,union,separate}.csv``
already exist (written by its prediction runs). Here, if they are missing
they are regenerated from the alignment artifacts that
``visium_alignment.py`` saves (X/Y/aligned coords): per-gene k-fold GPR R^2
with coords = aligned (GPSA), observed pooled (Union), and per-view
(Separate) — the same three estimators the reference's prediction scripts
compare (visium_prediction.py / two_dimensional_prediction.py:126-158).

Run: python experiments/expression/visium/plot_prediction_results.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")
METHODS = ("gpsa", "union", "separate")


def _per_gene_r2(coords, Y, train_idx, test_idx):
    """Per-gene R^2 of a GPR fit on (coords[train], Y[train])."""
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import RBF, WhiteKernel
    from sklearn.metrics import r2_score

    gpr = GaussianProcessRegressor(WhiteKernel() + RBF())
    gpr.fit(coords[train_idx], Y[train_idx])
    preds = gpr.predict(coords[test_idx])
    if preds.ndim == 1:
        preds = preds[:, None]
    return np.array(
        [r2_score(Y[test_idx, g], preds[:, g]) for g in range(Y.shape[1])]
    )


def regenerate_error_csvs(n_splits=3):
    """Rebuild the reference's three trials-x-genes R^2 CSVs from the saved
    alignment artifacts (each k-fold split is one 'trial' row)."""
    needed = [
        os.path.join(OUT_DIR, f)
        for f in (
            "X_visium.csv",
            "Y_visium.csv",
            "aligned_coords_visium.csv",
            "view_idx_visium.json",
        )
    ]
    if not all(os.path.exists(p) for p in needed):
        print("alignment artifacts missing -> running visium_alignment inline")
        import subprocess

        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "visium_alignment.py"),
            ],
            check=True,
        )

    X = np.loadtxt(needed[0], delimiter=",")
    Y = np.loadtxt(needed[1], delimiter=",")
    aligned = np.loadtxt(needed[2], delimiter=",")
    with open(needed[3]) as f:
        view_idx = {k: np.asarray(v, int) for k, v in json.load(f).items()}
    views = [view_idx[k] for k in sorted(view_idx)]

    from sklearn.model_selection import KFold

    rows = {m: [] for m in METHODS}
    for train_idx, test_idx in KFold(n_splits=n_splits).split(aligned):
        rows["gpsa"].append(_per_gene_r2(aligned, Y, train_idx, test_idx))
        rows["union"].append(_per_gene_r2(X, Y, train_idx, test_idx))
        # Separate: fit one GPR per view on observed coords, score each test
        # point with its own view's model (two_dimensional_prediction.py's
        # "separate" baseline).
        sep_scores = np.zeros(Y.shape[1])
        weight = 0
        for vv in views:
            tr = np.intersect1d(train_idx, vv)
            te = np.intersect1d(test_idx, vv)
            if len(tr) == 0 or len(te) == 0:
                continue
            sep_scores += len(te) * _per_gene_r2(
                X, Y, tr, te
            )
            weight += len(te)
        rows["separate"].append(sep_scores / max(weight, 1))

    for m in METHODS:
        arr = np.asarray(rows[m])  # (trials, genes)
        np.savetxt(
            os.path.join(OUT_DIR, f"prediction_errors_{m}.csv"),
            arr,
            delimiter=",",
        )
    return {m: np.asarray(rows[m]) for m in METHODS}


def load_or_regenerate():
    paths = {
        m: os.path.join(OUT_DIR, f"prediction_errors_{m}.csv") for m in METHODS
    }
    if all(os.path.exists(p) for p in paths.values()):
        return {
            m: np.atleast_2d(np.loadtxt(p, delimiter=","))
            for m, p in paths.items()
        }
    return regenerate_error_csvs()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(OUT_DIR, "two_d_prediction_comparison_visium.png"),
    )
    args = ap.parse_args()
    os.makedirs(OUT_DIR, exist_ok=True)

    errors = load_or_regenerate()
    gpsa, union = errors["gpsa"], errors["union"]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 7))

    # Left: per-trial mean R^2 boxplot, GPSA vs Union (reference keeps
    # Separate out of this panel too).
    ax1.boxplot(
        [gpsa.mean(axis=1), union.mean(axis=1)],
        tick_labels=["GPSA", "Union"],
        patch_artist=True,
        boxprops=dict(facecolor="lightgray"),
        medianprops=dict(color="black"),
    )
    ax1.set_ylabel(r"$R^2$")
    fig.suptitle("Visium prediction")

    # Right: per-gene mean +/- std, GPSA vs Union, with y = x.
    ax2.errorbar(
        x=union.mean(axis=0),
        y=gpsa.mean(axis=0),
        xerr=union.std(axis=0),
        yerr=gpsa.std(axis=0),
        fmt="o",
        ecolor="black",
        color="black",
    )
    ax2.set_xlabel(r"$R^2$, Union")
    ax2.set_ylabel(r"$R^2$, GPSA")
    lims = [
        min(ax2.get_xlim()[0], ax2.get_ylim()[0]),
        max(ax2.get_xlim()[1], ax2.get_ylim()[1]),
    ]
    ax2.plot(lims, lims, "-", alpha=0.75, zorder=0, color="gray")
    ax2.set_aspect("equal")
    ax2.set_xlim(lims)
    ax2.set_ylim(lims)

    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    summary = {
        "figure": args.out,
        "gpsa_mean_r2": float(gpsa.mean()),
        "union_mean_r2": float(union.mean()),
        "separate_mean_r2": float(errors["separate"].mean()),
        "n_trials": int(gpsa.shape[0]),
        "n_genes": int(gpsa.shape[1]),
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
