"""GSEA on the aligned-variance gene ranking (Python replacement for the
reference's R handoff, /root/reference/experiments/expression/st/
st_genevariance_gsea.R).

Reads the per-gene ranking produced by st_variance_analysis.py
(out/gene_variance_ranking.csv), z-scales the statistic, runs a permutation
preranked GSEA plus a Fisher-exact over-representation test of the top
genes against a GMT gene-set collection (``--gmt``; a planted synthetic
collection is generated when none is supplied), and writes
out/st_avg_gene_variance_gsea_results.csv in the reference's column layout
(pathway, padj, ES, NES).

Run: python experiments/expression/st/st_genevariance_gsea.py [--gmt sets.gmt]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu.utils import load_gmt, permutation_gsea, fisher_exact_gsea

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")
RANKING = os.path.join(OUT_DIR, "gene_variance_ranking.csv")


def synthetic_gene_sets(gene_names, stats, rng):
    """Stand-in GMT collection: one set planted in the top of the ranking,
    plus random decoys (lets the pipeline demonstrate a positive hit)."""
    order = np.argsort(-stats)
    sets = {"PLANTED_TOP_VARIANCE": list(np.asarray(gene_names)[order[:8]])}
    for i in range(9):
        sets[f"RANDOM_SET_{i}"] = list(rng.choice(gene_names, 8, replace=False))
    return sets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gmt", default=None, help="GMT gene-set collection")
    ap.add_argument("--n-perm", type=int, default=1000)
    ap.add_argument("--n-hit-genes", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if not os.path.exists(RANKING):
        print("ranking missing -> running st_variance_analysis inline")
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "st_variance_analysis.py")],
            check=True,
        )

    import pandas as pd

    ranking = pd.read_csv(RANKING)
    gene_names = ranking.iloc[:, 0].astype(str).values
    stats = ranking.iloc[:, 1].astype(float).values
    # z-scale the statistic (st_genevariance_gsea.R:16-18)
    stats = (stats - stats.mean()) / (stats.std() + 1e-12)

    rng = np.random.default_rng(args.seed)
    gene_sets = load_gmt(args.gmt) if args.gmt else synthetic_gene_sets(gene_names, stats, rng)

    gsea = permutation_gsea(
        gene_names, stats, gene_sets, n_perm=args.n_perm, seed=args.seed
    )
    df = pd.DataFrame(gsea)[["pathway", "padj", "ES", "NES"]]
    os.makedirs(OUT_DIR, exist_ok=True)
    df.to_csv(os.path.join(OUT_DIR, "st_avg_gene_variance_gsea_results.csv"))
    print(df.head(10).to_string())

    hit_genes = list(gene_names[np.argsort(-stats)[: args.n_hit_genes]])
    fisher = fisher_exact_gsea(hit_genes, list(gene_names), gene_sets)
    with open(os.path.join(OUT_DIR, "st_gene_variance_fisher_gsea.json"), "w") as f:
        json.dump(fisher, f, indent=2)
    if fisher:
        top = fisher[0]
        print(f"top Fisher hit: {top['pathway']} adj_pval={top['adj_pval']:.4g}")


if __name__ == "__main__":
    main()
