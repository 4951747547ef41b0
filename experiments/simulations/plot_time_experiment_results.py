"""Plot the wall-clock scaling comparison from the saved time-experiment CSV.

One-to-one counterpart of /root/reference/experiments/simulations/
plot_time_experiment_results.py (time vs N curves over
out/time_experiment_results.csv). The producing harness here is
time_complexity.py, which records per-N steps/sec for this framework and the
live torch reference plus the OT-baseline wall-clock.

Run: python experiments/simulations/plot_time_experiment_results.py
"""

import csv
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "..", "out")


def main():
    rows = []
    with open(os.path.join(OUT, "time_experiment_results.csv")) as f:
        for row in csv.DictReader(f):
            rows.append({k: float(v) for k, v in row.items()})
    rows.sort(key=lambda r: r["n_per_view"])
    ns = [r["n_per_view"] for r in rows]

    fig, axes = plt.subplots(1, 2, figsize=(13, 5))

    ax = axes[0]
    ax.plot(ns, [r["ours_steps_per_sec"] for r in rows], marker="o",
            label="this framework (TPU)")
    ax.plot(ns, [r["reference_steps_per_sec"] for r in rows], marker="s",
            label="torch reference (CPU)")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("Spots per view")
    ax.set_ylabel("ELBO steps / sec")
    ax.legend(fontsize=9)

    ax = axes[1]
    ax.plot(ns, [r["speedup"] for r in rows], marker="o", color="#2266aa")
    ax.set_xscale("log")
    ax.set_xlabel("Spots per view")
    ax.set_ylabel("Speedup (ours / reference)")
    for n, r in zip(ns, rows):
        ax.annotate(f"{r['speedup']:.0f}x", (n, r["speedup"]),
                    textcoords="offset points", xytext=(0, 6), fontsize=9)

    fig.tight_layout()
    out = os.path.join(OUT, "time_experiment_results.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
