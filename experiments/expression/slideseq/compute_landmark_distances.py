"""Landmark-distance evaluation of an alignment.

Port of /root/reference/experiments/expression/slideseq/
compute_landmark_distances.py:36-50: distances between hand-placed matched
anatomical landmarks of two views, before and after alignment.

Landmarks: --landmarks CSV with columns [x1, y1, x2, y2] (matched pairs in
view-1 / view-2 observed coordinates), plus the aligned-coords CSV from an
alignment run. Without inputs, demonstrates on a synthetic pair.

Run: python experiments/expression/slideseq/compute_landmark_distances.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from spatial_alignment_tpu.utils import landmark_distances


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--landmarks", default=None)
    ap.add_argument("--aligned-a", default=None)
    ap.add_argument("--aligned-b", default=None)
    args = ap.parse_args()

    if args.landmarks and args.aligned_a and args.aligned_b:
        import pandas as pd

        lm = pd.read_csv(args.landmarks).to_numpy(float)
        pre = landmark_distances(lm[:, :2], lm[:, 2:4])
        a = np.loadtxt(args.aligned_a, delimiter=",")
        b = np.loadtxt(args.aligned_b, delimiter=",")
        post = landmark_distances(a, b)
    else:
        rng = np.random.default_rng(0)
        true = rng.uniform(0, 10, (8, 2))
        pre = landmark_distances(true, true + rng.normal(0, 0.8, true.shape))
        post = landmark_distances(true, true + rng.normal(0, 0.1, true.shape))

    out = {
        "pre_mean_distance": float(pre.mean()),
        "post_mean_distance": float(post.mean()),
        "per_landmark_pre": pre.tolist(),
        "per_landmark_post": post.tolist(),
    }
    print(json.dumps({k: out[k] for k in list(out)[:2]}, indent=2))
    out_dir = os.path.join(os.path.dirname(__file__), "out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "landmark_distances.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
