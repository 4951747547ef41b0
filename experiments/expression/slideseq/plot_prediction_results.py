"""Plot the saved Slide-seq prediction comparison.

Port of /root/reference/experiments/expression/slideseq/
plot_prediction_results.py: per-trial mean Pearson-r boxplot (Union vs
GPSA), per-gene mean +/- stddev errorbar scatter (Union vs GPSA), and
best/worst predicted example-gene scatters — all from the CSVs written by
slideseq_prediction_save_preds.py.

Run: python experiments/expression/slideseq/plot_prediction_results.py
"""

import os
import sys

import numpy as np
import pandas as pd
from scipy.stats import pearsonr

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import seaborn as sns

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")


def main():
    needed = [
        os.path.join(OUT_DIR, f)
        for f in (
            "prediction_errors_union.csv",
            "prediction_errors_separate.csv",
            "prediction_errors_gpsa.csv",
            "slideseq_preds_gpsa.csv",
            "slideseq_truth_gpsa.csv",
            "slideseq_pred_gene_names.csv",
        )
    ]
    if not all(os.path.exists(p) for p in needed):
        sys.exit("run slideseq_prediction_save_preds.py first")

    errors_union = pd.read_csv(needed[0], index_col=0)
    errors_gpsa = pd.read_csv(needed[2], index_col=0)

    plt.figure(figsize=(14, 7))

    # Per-trial mean Pearson r, Union vs GPSA
    plt.subplot(121)
    trialwise = pd.DataFrame(
        {
            "value": pd.concat([errors_union.mean(1), errors_gpsa.mean(1)]).values,
            "method": ["Union"] * len(errors_union) + ["GPSA"] * len(errors_gpsa),
        }
    )
    sns.boxplot(data=trialwise, x="method", y="value", color="gray")
    plt.xlabel("")
    plt.ylabel(r"Pearson $\rho$")
    plt.suptitle("Slide-seqV2 prediction")

    # Per-gene mean +/- stddev across trials
    plt.subplot(122)
    plt.errorbar(
        x=errors_union.mean(0).values,
        y=errors_gpsa.mean(0).values,
        xerr=errors_union.std(0).values,
        yerr=errors_gpsa.std(0).values,
        fmt="o",
        ecolor="black",
        color="black",
    )
    plt.xlabel(r"Pearson $\rho$, Union")
    plt.ylabel(r"Pearson $\rho$, GPSA")
    ax = plt.gca()
    lims = [
        np.min([ax.get_xlim(), ax.get_ylim()]),
        np.max([ax.get_xlim(), ax.get_ylim()]),
    ]
    ax.plot(lims, lims, "-", alpha=0.75, zorder=0, color="gray")
    ax.set_aspect("equal")
    ax.set_xlim(lims)
    ax.set_ylim(lims)
    plt.tight_layout()
    plt.savefig(os.path.join(OUT_DIR, "two_d_prediction_comparison_slideseq.png"))
    plt.close()

    # Example genes: best and worst predicted
    preds = pd.read_csv(needed[3], index_col=0)
    truth = pd.read_csv(needed[4], index_col=0)
    gene_names = pd.read_csv(needed[5]).iloc[:, 0].values
    r = np.array(
        [
            pearsonr(truth.iloc[:, j], preds.iloc[:, j]).statistic
            if truth.iloc[:, j].std() > 0 and preds.iloc[:, j].std() > 0
            else 0.0
            for j in range(preds.shape[1])
        ]
    )
    order = np.argsort(r)
    n_show = min(3, preds.shape[1])
    plt.figure(figsize=(n_show * 5, 10))
    for i, gene_idx in enumerate(order[-n_show:]):
        plt.subplot(2, n_show, i + 1)
        plt.scatter(truth.iloc[:, gene_idx], preds.iloc[:, gene_idx], c="gray", s=10)
        plt.xlabel("True expression")
        plt.ylabel("Predicted expression")
        plt.title(str(gene_names[gene_idx]).upper())
    for i, gene_idx in enumerate(order[:n_show]):
        plt.subplot(2, n_show, n_show + i + 1)
        plt.scatter(truth.iloc[:, gene_idx], preds.iloc[:, gene_idx], c="gray", s=10)
        plt.xlabel("True expression")
        plt.ylabel("Predicted expression")
        plt.title(str(gene_names[gene_idx]).upper())
    plt.tight_layout()
    plt.savefig(os.path.join(OUT_DIR, "slideseq_prediction_examples.png"))
    plt.close()
    print("wrote prediction comparison + example-gene plots")


if __name__ == "__main__":
    main()
