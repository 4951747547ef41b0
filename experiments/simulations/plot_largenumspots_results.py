"""Plot the large-numspots (2,500 spots/view) alignment errors from the saved
artifact.

One-to-one counterpart of /root/reference/experiments/simulations/
plot_largenumspots_results.py (sns.boxplot of method vs error over
error_experiment_large_numspots.csv). The producing harness here is
simulation_large_numspots.py, which writes experiments/out/large_numspots.json
with per-method errors (observed / OT baseline / GPSA) instead of a melted
CSV.

Run: python experiments/simulations/plot_largenumspots_results.py
"""

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "..", "out")


def main():
    path = os.path.join(OUT, "large_numspots.json")
    with open(path) as f:
        d = json.load(f)

    methods = ["Observed", "OT (PASTE-style)", "GPSA"]
    errors = [d["observed_error"], d["ot_baseline_error"], d["aligned_error"]]

    fig, ax = plt.subplots(figsize=(7, 6))
    ax.bar(methods, errors, color=["#999999", "#77aadd", "#2266aa"])
    ax.set_yscale("log")
    ax.set_ylabel("Error")
    ax.set_title(f"Alignment error at {d['n_spots_total']} spots")
    for i, e in enumerate(errors):
        ax.text(i, e, f"{e:.3g}", ha="center", va="bottom", fontsize=9)
    fig.tight_layout()
    out = os.path.join(OUT, "error_experiment_large_numspots.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
