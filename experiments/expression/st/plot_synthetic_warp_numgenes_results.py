"""Plot the saved genes-count sweep of synthetic-warp recovery on ST data.

One-to-one counterpart of /root/reference/experiments/expression/st/
plot_synthetic_warp_numgenes_results.py (sns plot over
st_alignment_synthetic_warp_numgenes.csv). The producing harness here is
st_alignment_synthetic_warp_numgenes.py, which writes the JSON twin.

Run: python experiments/expression/st/plot_synthetic_warp_numgenes_results.py
"""

import json
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "out")


def main():
    with open(os.path.join(OUT, "st_alignment_synthetic_warp_numgenes.json")) as f:
        rows = json.load(f)["rows"]

    ks = sorted({r["variable"] for r in rows})
    types = sorted({r["Type"] for r in rows})

    fig, ax = plt.subplots(figsize=(12, 5))
    width = 0.35
    colors = {"Spatially correlated": "#2266aa", "Spatially uncorrelated": "#cc6644"}
    for i, typ in enumerate(types):
        data = [[r["value"] for r in rows if r["variable"] == k and r["Type"] == typ]
                for k in ks]
        pos = np.arange(len(ks)) + (i - (len(types) - 1) / 2) * width
        bp = ax.boxplot(data, positions=pos, widths=width * 0.9, patch_artist=True)
        for b in bp["boxes"]:
            b.set_facecolor(colors.get(typ, "#999999"))
    ax.set_xticks(np.arange(len(ks)))
    ax.set_xticklabels([str(k) for k in ks])
    ax.set_xlabel("Number of genes")
    ax.set_ylabel("Error")
    handles = [plt.Rectangle((0, 0), 1, 1, facecolor=colors.get(t, "#999999"))
               for t in types]
    ax.legend(handles, types, loc="center left", bbox_to_anchor=(1, 0.5))
    fig.tight_layout()
    out = os.path.join(OUT, "st_alignment_synthetic_warp_numgenes_boxplot.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
