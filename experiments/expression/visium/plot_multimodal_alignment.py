"""Plot saved multimodal (expression + histology) alignment artifacts.

Port of /root/reference/experiments/expression/visium/
plot_multimodal_alignment.py: 2x2 panels — observed vs aligned coordinates
for each modality, colored by the first output channel (RGB for histology
when it has 3 channels). Reads the CSVs written by
visium_multimodal_alignment.py.

Run: python experiments/expression/visium/plot_multimodal_alignment.py
"""

import json
import os
import sys

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "out")
MODALITIES = ("expression", "histology")


def main():
    needed = [
        os.path.join(OUT_DIR, f"multimodal_{kind}_{mod}.csv")
        for mod in MODALITIES
        for kind in ("X", "Y", "aligned")
    ] + [os.path.join(OUT_DIR, "multimodal_n_samples.json")]
    if not all(os.path.exists(p) for p in needed):
        print("artifacts missing -> running visium_multimodal_alignment inline")
        import subprocess

        subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "visium_multimodal_alignment.py"),
            ],
            check=True,
        )

    with open(os.path.join(OUT_DIR, "multimodal_n_samples.json")) as f:
        n_samples = json.load(f)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    markers = [".", "+"]
    fig, axes = plt.subplots(2, 2, figsize=(12, 10))
    for row, mod in enumerate(MODALITIES):
        X = np.loadtxt(os.path.join(OUT_DIR, f"multimodal_X_{mod}.csv"), delimiter=",")
        Y = np.loadtxt(os.path.join(OUT_DIR, f"multimodal_Y_{mod}.csv"), delimiter=",")
        A = np.loadtxt(os.path.join(OUT_DIR, f"multimodal_aligned_{mod}.csv"), delimiter=",")
        rgb = mod == "histology" and Y.ndim == 2 and Y.shape[1] == 3
        if rgb:  # normalize channels into [0, 1] for RGB coloring
            c_all = (Y - Y.min(0)) / (Y.max(0) - Y.min(0) + 1e-12)
        else:
            c_all = Y[:, 0] if Y.ndim == 2 else Y
        bounds = np.cumsum([0] + n_samples[mod])
        for col, (coords, title) in enumerate(
            [(X, f"Observed {mod}"), (A, f"Aligned {mod}")]
        ):
            ax = axes[row, col]
            for vv in range(len(n_samples[mod])):
                idx = slice(bounds[vv], bounds[vv + 1])
                ax.scatter(
                    coords[idx, 0],
                    coords[idx, 1],
                    c=c_all[idx],
                    marker=markers[vv % len(markers)],
                    s=25,
                    label=f"View {vv + 1}",
                )
            ax.set_title(title)
            ax.set_axis_off()
    axes[0, 0].legend(loc="upper right", fontsize=8)
    plt.tight_layout()
    path = os.path.join(OUT_DIR, "multimodal_alignment_panels.png")
    plt.savefig(path)
    plt.close()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
