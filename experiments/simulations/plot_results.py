"""Render panels from saved experiment results.

Consolidates the reference's plot-from-CSV scripts (plot_errors.py,
plot_largenumspots_results.py, plot_parameter_range_results.py,
plot_time_experiment_results.py) into one renderer over the JSON/CSV
artifacts in experiments/out/.

Run: python experiments/simulations/plot_results.py
"""

import csv
import json
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "..", "out")


def _load(name):
    path = os.path.join(OUT, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main():
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))

    # warp-magnitude error curves (plot_errors.py analog)
    ax = axes[0, 0]
    for warp in ("gp", "linear", "polar"):
        data = _load(f"warp_magnitude_{warp}.json")
        if data:
            rows = data["rows"]
            ax.plot([r["magnitude"] for r in rows], [r["post"] for r in rows],
                    marker="o", label=f"{warp} (post)")
            ax.plot([r["magnitude"] for r in rows], [r["pre"] for r in rows],
                    marker="x", linestyle="--", alpha=0.5, label=f"{warp} (pre)")
    ax.set_yscale("log")
    ax.set_xlabel("warp magnitude")
    ax.set_ylabel("aligned-view error")
    ax.set_title("Error vs warp magnitude")
    ax.legend(fontsize=8)

    # noise-level robustness
    ax = axes[0, 1]
    data = _load("noise_level.json")
    if data:
        rows = data["rows"]
        ax.plot([r["noise_variance"] for r in rows], [r["post"] for r in rows], marker="o")
        ax.plot([r["noise_variance"] for r in rows], [r["pre"] for r in rows],
                marker="x", linestyle="--", alpha=0.5)
        ax.set_xscale("log")
        ax.set_yscale("log")
    ax.set_xlabel("noise variance")
    ax.set_ylabel("error")
    ax.set_title("Error vs observation noise")

    # parameter-range heatmap (plot_parameter_range_results.py analog)
    ax = axes[1, 0]
    data = _load("parameter_range.json")
    if data:
        rows = data["rows"]
        variances = sorted({r["variance"] for r in rows})
        lss = sorted({r["lengthscale"] for r in rows})
        grid = np.full((len(variances), len(lss)), np.nan)
        for r in rows:
            grid[variances.index(r["variance"]), lss.index(r["lengthscale"])] = r["post"]
        im = ax.imshow(np.log10(grid), cmap="viridis_r")
        ax.set_xticks(range(len(lss)), lss)
        ax.set_yticks(range(len(variances)), variances)
        plt.colorbar(im, ax=ax, label="log10 error")
    ax.set_xlabel("warp lengthscale")
    ax.set_ylabel("warp variance")
    ax.set_title("Error across fixed warp hyperparameters")

    # wall-clock speedup (plot_time_experiment_results.py analog)
    ax = axes[1, 1]
    tc_path = os.path.join(OUT, "time_experiment_results.csv")
    if os.path.exists(tc_path):
        with open(tc_path) as f:
            rows = list(csv.DictReader(f))
        n = [int(r["n_per_view"]) for r in rows]
        ax.plot(n, [float(r["ours_steps_per_sec"]) for r in rows], marker="o", label="TPU rebuild")
        if "reference_steps_per_sec" in rows[0]:
            ax.plot(n, [float(r["reference_steps_per_sec"]) for r in rows],
                    marker="x", label="torch reference (CPU)")
        ax.set_yscale("log")
        ax.legend()
    ax.set_xlabel("spots per view")
    ax.set_ylabel("steps/sec")
    ax.set_title("Training throughput")

    path = os.path.join(OUT, "results_panels.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
