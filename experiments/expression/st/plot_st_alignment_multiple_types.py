"""Plot the saved multi-warp-family ST recovery errors.

One-to-one counterpart of /root/reference/experiments/expression/st/
plot_st_alignment_multiple_types.py:16-29 (sns.boxplot of log error by warp
type over st_alignment_synthetic_warp_mulitple_types.csv [sic]). The
producing harness here is st_alignment_synthetic_warp_multiple_types.py,
which writes the JSON twin of that CSV.

Run: python experiments/expression/st/plot_st_alignment_multiple_types.py
"""

import json
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "out")


def main():
    with open(
        os.path.join(OUT, "st_alignment_synthetic_warp_multiple_types.json")
    ) as f:
        rows = json.load(f)["rows"]

    types = sorted({r["Warp type"] for r in rows})
    post = [np.log([r["value"] for r in rows if r["Warp type"] == t]) for t in types]
    pre = [np.log([r["pre"] for r in rows if r["Warp type"] == t]) for t in types]

    fig, ax = plt.subplots(figsize=(10, 5))
    pos = np.arange(len(types))
    bp1 = ax.boxplot(pre, positions=pos - 0.18, widths=0.3, patch_artist=True)
    bp2 = ax.boxplot(post, positions=pos + 0.18, widths=0.3, patch_artist=True)
    for b in bp1["boxes"]:
        b.set_facecolor("#bbbbbb")
    for b in bp2["boxes"]:
        b.set_facecolor("#2266aa")
    ax.set_xticks(pos)
    ax.set_xticklabels(types)
    ax.set_xlabel("Warp type")
    ax.set_ylabel("log(error)")
    ax.legend([bp1["boxes"][0], bp2["boxes"][0]], ["observed (pre)", "GPSA"],
              loc="center left", bbox_to_anchor=(1, 0.5))
    fig.tight_layout()
    out = os.path.join(OUT, "st_alignment_synthetic_warp_multiple_types_boxplot.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
