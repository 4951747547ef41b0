"""Volcano-style plot of the gene-variance GSEA results.

Port of /root/reference/experiments/expression/st/plot_gsea_results.py:
NES vs -log10(adjusted p), labeling the top-NES gene sets. Reads the CSV
written by st_genevariance_gsea.py.

Run: python experiments/expression/st/plot_gsea_results.py
"""

import os
import sys

import numpy as np
import pandas as pd

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import seaborn as sns

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")
N_GENE_SETS_TO_NAME = 2


def main():
    path = os.path.join(OUT_DIR, "st_avg_gene_variance_gsea_results.csv")
    if not os.path.exists(path):
        sys.exit("run st_genevariance_gsea.py first")
    df = pd.read_csv(path, index_col=0)
    df["logpval"] = -np.log10(df.padj.values + 1e-300)

    plt.figure(figsize=(7, 7))
    sns.scatterplot(data=df, x="NES", y="logpval", color="black", edgecolor=None)
    plt.xlabel("Enrichment score")
    plt.ylabel(r"$-\log_{10}$(p-val)")

    order = np.argsort(-df.NES.values)
    for i in range(min(N_GENE_SETS_TO_NAME, len(df))):
        name = " ".join(str(df.pathway.values[order[i]]).split("_")[1:]) or str(
            df.pathway.values[order[i]]
        )
        plt.text(s=name, x=df.NES.values[order[i]], y=df.logpval.values[order[i]], ha="right")

    plt.tight_layout()
    plt.savefig(os.path.join(OUT_DIR, "st_avg_gene_variance_gsea_results.png"))
    plt.close()
    print("wrote st_avg_gene_variance_gsea_results.png")


if __name__ == "__main__":
    main()
