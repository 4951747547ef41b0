"""Generate examples/synthetic_data.h5ad.

Recreates the reference's example dataset format
(/root/reference/examples/synthetic_data.h5ad: AnnData with 200 obs x 30
vars, obsm["spatial"] (200, 2), obs["batch"] in {0, 1}, 100 spots/view)
from the packaged generator, written as an AnnData-compatible HDF5 via h5py
(anndata itself not required).

Run: python examples/make_synthetic_data.py
"""

import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spatial_alignment_tpu.data import generate_twod_data


def main(path=None, seed=0):
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "synthetic_data.h5ad")
    rng = np.random.default_rng(seed)
    X, Y, n_samples_list, view_idx = generate_twod_data(
        n_views=2,
        n_outputs=30,
        grid_size=10,
        n_latent_gps=5,
        kernel_variance=0.25,
        kernel_lengthscale=5.0,
        noise_variance=0.001,
        fixed_view_idx=0,
        rng=rng,
    )
    batch = np.concatenate(
        [np.full(n, i, dtype=np.int64) for i, n in enumerate(n_samples_list)]
    )
    n_obs = X.shape[0]

    with h5py.File(path, "w") as f:
        f.attrs["encoding-type"] = "anndata"
        f.attrs["encoding-version"] = "0.1.0"
        f.create_dataset("X", data=Y.astype(np.float32))
        obs = f.create_group("obs")
        obs.attrs["_index"] = "_index"
        obs.attrs["encoding-type"] = "dataframe"
        obs.attrs["encoding-version"] = "0.2.0"
        obs.attrs["column-order"] = np.array(["batch"], dtype=h5py.string_dtype())
        obs.create_dataset(
            "_index",
            data=np.array([f"spot_{i}" for i in range(n_obs)], dtype=object),
            dtype=h5py.string_dtype(),
        )
        obs.create_dataset("batch", data=batch)
        var = f.create_group("var")
        var.attrs["_index"] = "_index"
        var.attrs["encoding-type"] = "dataframe"
        var.attrs["encoding-version"] = "0.2.0"
        var.attrs["column-order"] = np.array([], dtype=h5py.string_dtype())
        var.create_dataset(
            "_index",
            data=np.array([f"gene_{i}" for i in range(Y.shape[1])], dtype=object),
            dtype=h5py.string_dtype(),
        )
        obsm = f.create_group("obsm")
        obsm.create_dataset("spatial", data=X.astype(np.float64))
    print(f"wrote {path}: {n_obs} obs x {Y.shape[1]} vars, views {n_samples_list}")


if __name__ == "__main__":
    main()
