"""Plot alignment error across the warp-prior parameter grid from the saved
artifact.

One-to-one counterpart of /root/reference/experiments/simulations/
plot_parameter_range_results.py:24-70 (two sns.lineplot panels over
error_experiment_parameter_range_{spatial_variance,lengthscale}.csv). The
producing harness here is error_experiment_parameter_range.py, which writes
experiments/out/parameter_range.json with one row per (variance, lengthscale)
cell.

Run: python experiments/simulations/plot_parameter_range_results.py
"""

import json
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "..", "out")


def main():
    with open(os.path.join(OUT, "parameter_range.json")) as f:
        d = json.load(f)
    rows = d["rows"]
    variances = sorted({r["variance"] for r in rows})
    lengthscales = sorted({r["lengthscale"] for r in rows})

    fig, axes = plt.subplots(1, 2, figsize=(14, 5))

    # error vs kernel variance, one line per lengthscale
    ax = axes[0]
    for ls in lengthscales:
        xs = [r["variance"] for r in rows if r["lengthscale"] == ls]
        ys = [r["post"] for r in rows if r["lengthscale"] == ls]
        order = np.argsort(xs)
        ax.plot(np.asarray(xs)[order], np.asarray(ys)[order], marker="o",
                label=f"lengthscale {ls}")
    ax.axhline(d["pre"], color="gray", linestyle="--", label="observed (pre)")
    ax.set_yscale("log")
    ax.set_xlabel("Warp kernel variance")
    ax.set_ylabel("Error")
    ax.legend(fontsize=8)

    # error vs kernel lengthscale, one line per variance
    ax = axes[1]
    for v in variances:
        xs = [r["lengthscale"] for r in rows if r["variance"] == v]
        ys = [r["post"] for r in rows if r["variance"] == v]
        order = np.argsort(xs)
        ax.plot(np.asarray(xs)[order], np.asarray(ys)[order], marker="o",
                label=f"variance {v}")
    ax.axhline(d["pre"], color="gray", linestyle="--", label="observed (pre)")
    ax.set_yscale("log")
    ax.set_xlabel("Warp kernel lengthscale")
    ax.set_ylabel("Error")
    ax.legend(fontsize=8)

    fig.tight_layout()
    out = os.path.join(OUT, "error_experiment_parameter_range.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
