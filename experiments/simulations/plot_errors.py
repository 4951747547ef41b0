"""Plot saved error sweeps: outputs-count / warp-magnitude / noise-variance.

One-to-one counterpart of /root/reference/experiments/simulations/
plot_errors.py:1-73 (three sns.lineplot panels over error_vary_*.csv). Here
the saved artifacts are the JSON summaries committed by
two_dimensional_warp_magnitude.py (per warp family) and
two_dimensional_noise_level.py; the number-of-outputs panel reads the
numgenes sweep artifact when present (the reference's error_vary_n_outputs
study lives in experiments/expression/st/st_alignment_synthetic_warp_numgenes
in this repo).

Run: python experiments/simulations/plot_errors.py
"""

import json
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "..", "out")
ST_OUT = os.path.join(os.path.dirname(__file__), "..", "expression", "st", "out")


def _load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main():
    fig, axes = plt.subplots(1, 3, figsize=(18, 5))

    # Panel 1: error vs number of outputs (reference plot_errors.py:26-38)
    ax = axes[0]
    data = _load(os.path.join(ST_OUT, "st_alignment_synthetic_warp_numgenes.json"))
    if data:
        ks = sorted({r["variable"] for r in data["rows"]})
        for typ in sorted({r["Type"] for r in data["rows"]}):
            vals = [
                np.mean([r["value"] for r in data["rows"]
                         if r["variable"] == k and r["Type"] == typ])
                for k in ks
            ]
            ax.plot(ks, vals, marker="o", label=typ)
        ax.legend(fontsize=8)
    else:
        ax.text(0.5, 0.5, "run st_alignment_synthetic_warp_numgenes.py",
                ha="center", transform=ax.transAxes)
    ax.set_xlabel("Number of outputs")
    ax.set_ylabel("Error")

    # Panel 2: error vs warp magnitude (reference plot_errors.py:40-52)
    ax = axes[1]
    for warp in ("gp", "linear", "polar"):
        data = _load(os.path.join(OUT, f"warp_magnitude_{warp}.json"))
        if data:
            rows = data["rows"]
            ax.plot([r["magnitude"] for r in rows], [r["post"] for r in rows],
                    marker="o", label=warp)
    ax.set_yscale("log")
    ax.set_xlabel("Warp magnitude")
    ax.set_ylabel("Error")
    ax.legend(fontsize=8)

    # Panel 3: error vs noise variance (reference plot_errors.py:54-66)
    ax = axes[2]
    data = _load(os.path.join(OUT, "noise_level.json"))
    if data:
        rows = data["rows"]
        ax.plot([r["noise_variance"] for r in rows], [r["post"] for r in rows],
                marker="o", label="GPSA (post)")
        ax.plot([r["noise_variance"] for r in rows], [r["pre"] for r in rows],
                marker="x", linestyle="--", label="observed (pre)")
    ax.set_yscale("log")
    ax.set_xlabel("Noise variance")
    ax.set_ylabel("Error")
    ax.legend(fontsize=8)

    fig.tight_layout()
    path = os.path.join(OUT, "plot_errors.png")
    fig.savefig(path, dpi=120)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
