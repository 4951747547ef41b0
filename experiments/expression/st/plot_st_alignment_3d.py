"""Plot the saved 3-D ST common-coordinate reconstruction, slice by slice.

One-to-one counterpart of /root/reference/experiments/expression/st/
plot_st_alignment_3d.py (3-D scatter + dense-grid reconstruction panels over
out/*.csv and G_test/F_pred dumps). The producing harness here is
st_alignment_3d.py, which writes reconstruction_grid.npy (dense-grid G_test
imputation, the reference's st_alignment_3d_round2.py:250-301 deliverable)
and the st_3d.json summary.

Run: python experiments/expression/st/plot_st_alignment_3d.py
"""

import json
import os

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

OUT = os.path.join(os.path.dirname(__file__), "out")


def main():
    with open(os.path.join(OUT, "st_3d.json")) as f:
        summary = json.load(f)
    recon = np.load(os.path.join(OUT, "reconstruction_grid.npy"))
    n_slices = summary["n_slices"]
    n_test = recon.shape[0]
    grid_res = int(round(np.sqrt(n_test / n_slices)))
    assert grid_res * grid_res * n_slices == n_test, (recon.shape, n_slices)

    # The dense grid was built with np.meshgrid(g, g, gz): index layout
    # (y, x, z) raveled C-order (st_alignment_3d.py:74-77).
    vol = recon[:, 0].reshape(grid_res, grid_res, n_slices)

    fig, axes = plt.subplots(1, n_slices, figsize=(4 * n_slices, 4))
    axes = np.atleast_1d(axes)
    for z in range(n_slices):
        im = axes[z].imshow(vol[:, :, z], origin="lower", extent=(0, 10, 0, 10),
                            cmap="viridis")
        axes[z].set_title(f"z = {z} (slice {z})")
    fig.colorbar(im, ax=axes.ravel().tolist(), shrink=0.8, label="gene 0")
    fig.suptitle(
        f"3-D common-coordinate reconstruction "
        f"({grid_res}x{grid_res}x{n_slices} G_test grid, "
        f"final loss {summary['final_loss']:.1f})",
        fontsize=12,
    )
    out = os.path.join(OUT, "st_alignment_3d.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
