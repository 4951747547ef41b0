"""CODEX mouse-spleen marker visualization with tile stitching.

Port of /root/reference/experiments/expression/codex/codex_alignment.py:23-38
— which only stitches per-tile coordinates into a global frame and plots a
marker (no GPSA fit). Data: a CSV with columns [tile_x, tile_y, x, y,
marker...] via --csv; otherwise a synthetic tiled stand-in.

Run: python experiments/expression/codex/codex_alignment.py
"""

import argparse
import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))


def stitch_tiles(tile_xy, local_xy, tile_size=1000.0):
    """Global coords = tile index * tile size + local coords
    (codex_alignment.py:23-38 pattern)."""
    return local_xy + tile_xy * tile_size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    if args.csv:
        import pandas as pd

        df = pd.read_csv(args.csv)
        tile_xy = df[["tile_x", "tile_y"]].to_numpy(float)
        local_xy = df[["x", "y"]].to_numpy(float)
        marker = df.iloc[:, 4].to_numpy(float)
    else:
        rng = np.random.default_rng(0)
        n_per_tile, tiles = 300, [(0, 0), (1, 0), (0, 1), (1, 1)]
        tile_xy = np.concatenate([np.tile(t, (n_per_tile, 1)) for t in tiles]).astype(float)
        local_xy = rng.uniform(0, 1000, (n_per_tile * len(tiles), 2))
        g = stitch_tiles(tile_xy, local_xy)
        marker = np.sin(g[:, 0] / 400.0) + np.cos(g[:, 1] / 400.0)

    global_xy = stitch_tiles(tile_xy, local_xy)
    fig, ax = plt.subplots(figsize=(7, 7))
    sc = ax.scatter(global_xy[:, 0], global_xy[:, 1], c=marker, s=6, cmap="viridis")
    fig.colorbar(sc)
    ax.set_title("CODEX stitched marker intensity")
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "codex_marker.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    print(f"wrote {path} ({global_xy.shape[0]} cells)")


if __name__ == "__main__":
    main()
