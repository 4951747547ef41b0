"""Real-data loaders and experiment preprocessing helpers.

The reference's expression experiments load AnnData/CSV datasets via
scanpy/anndata (visium_alignment.py:57-66, slideseq_prediction.py:87-108) and
one imports a ``st.load_st_data`` helper that is missing from the repo
(st_alignment.py:32). This module provides those capabilities without the
scanpy stack (h5py + pandas), plus the experiment-level preprocessing the
reference scripts implement inline:

  - ``knn_r2_gene_filter`` — spatially-variable-gene selection by 1-NN R^2
    (visium_alignment.py:42-254 pattern)
  - ``remove_outlier_spots`` — 10-NN distance outlier filter
    (slideseq_prediction.py:110-136)
  - ``rotate_coords`` — coarse rotation pre-alignment
    (slideseq_prediction.py / macosko two_slice_alignment.py:28-80)

When a dataset file is absent (this build environment has no network), the
``synthetic_*_like`` builders produce stand-ins with the same shapes and
statistical structure so every experiment script runs end-to-end.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.kernels import rbf_kernel_numpy
from ..utils.preprocess import get_st_coordinates

__all__ = [
    "load_h5ad",
    "load_st_data",
    "load_csv_expression",
    "knn_r2_gene_filter",
    "remove_outlier_spots",
    "rotate_coords",
    "synthetic_visium_like",
    "synthetic_slideseq_like",
    "synthetic_st_like",
]


def _read_sparse_group(g) -> np.ndarray:
    """Densify an AnnData sparse-encoded group (CSR or CSC)."""
    from scipy.sparse import csc_matrix, csr_matrix

    enc = g.attrs.get("encoding-type", "csr_matrix")
    if isinstance(enc, bytes):
        enc = enc.decode()
    shape = tuple(g.attrs["shape"])
    cls = csc_matrix if str(enc).startswith("csc") else csr_matrix
    return np.asarray(
        cls((g["data"][:], g["indices"][:], g["indptr"][:]), shape=shape).todense()
    )


def load_h5ad(path: str) -> Dict[str, np.ndarray]:
    """Minimal AnnData .h5ad reader (h5py): X, obs columns, obsm['spatial'].

    Handles dense, CSR- and CSC-encoded ``X``, and both plain and
    categorical (codes + categories groups, anndata >= 0.8 encoding) obs
    columns — categorical columns are returned as their decoded values.
    """
    import h5py

    out: Dict[str, np.ndarray] = {}
    with h5py.File(path, "r") as f:
        X = f["X"]
        out["X"] = _read_sparse_group(X) if isinstance(X, h5py.Group) else np.asarray(X)
        if "obsm" in f and "spatial" in f["obsm"]:
            out["spatial"] = np.asarray(f["obsm"]["spatial"])
        if "obs" in f:
            for key in f["obs"]:
                if key == "_index":
                    continue
                node = f["obs"][key]
                if isinstance(node, h5py.Dataset):
                    out[f"obs/{key}"] = np.asarray(node)
                elif isinstance(node, h5py.Group) and "codes" in node and (
                    "categories" in node
                ):
                    codes = np.asarray(node["codes"])
                    cats = np.asarray(node["categories"]).astype(str)
                    vals = np.where(codes >= 0, cats[np.maximum(codes, 0)], "")
                    out[f"obs/{key}"] = vals
        if "var" in f and "_index" in f["var"]:
            out["var_names"] = np.asarray(f["var"]["_index"]).astype(str)
    return out


def load_st_data(
    paths: Sequence[str], n_genes: Optional[int] = None
) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray]]:
    """Load classic Spatial Transcriptomics CSV layers (genes in columns,
    'AxB'-format spot index) — the loader the reference's ST experiments
    import but never shipped (st_alignment.py:32).

    Returns per-slice (coords_list, counts_list, gene_names_list), keeping
    only genes common to all slices (top ``n_genes`` by total count if set).
    """
    import pandas as pd

    dfs = [pd.read_csv(p, index_col=0) for p in paths]
    common = set(dfs[0].columns)
    for df in dfs[1:]:
        common &= set(df.columns)
    common = sorted(common)
    if n_genes is not None:
        totals = sum(df[common].sum(axis=0) for df in dfs)
        common = list(totals.sort_values(ascending=False).index[:n_genes])
    coords, counts, names = [], [], []
    for df in dfs:
        coords.append(get_st_coordinates(df))
        counts.append(df[common].to_numpy(dtype=float))
        names.append(np.asarray(common))
    return coords, counts, names


def load_csv_expression(
    coords_path: str, counts_path: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Generic loader: coords CSV (x, y columns) + counts CSV (spots x genes)."""
    import pandas as pd

    coords = pd.read_csv(coords_path).to_numpy(dtype=float)[:, :2]
    counts = pd.read_csv(counts_path, index_col=0).to_numpy(dtype=float)
    return coords, counts


# ---------------------------------------------------------------------------
# Experiment-level preprocessing
# ---------------------------------------------------------------------------


def knn_r2_gene_filter(
    X: np.ndarray, Y: np.ndarray, n_genes: int, n_neighbors: int = 1
) -> np.ndarray:
    """Rank genes by spatial predictability: R^2 of k-NN regression of each
    gene on spatial coordinates (the reference's spatially-variable-gene
    filter, visium_alignment.py pattern). Returns indices of the top genes.
    """
    from sklearn.neighbors import KNeighborsRegressor

    knn = KNeighborsRegressor(n_neighbors=n_neighbors)
    n = X.shape[0]
    half = n // 2
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    tr, te = perm[:half], perm[half:]
    knn.fit(X[tr], Y[tr])
    preds = knn.predict(X[te])
    resid = np.sum((Y[te] - preds) ** 2, axis=0)
    total = np.sum((Y[te] - Y[te].mean(axis=0)) ** 2, axis=0)
    total = np.where(total == 0, 1.0, total)
    r2 = 1.0 - resid / total
    return np.argsort(-r2)[:n_genes]


def remove_outlier_spots(
    coords: np.ndarray, n_neighbors: int = 10, quantile: float = 0.99
) -> np.ndarray:
    """Boolean keep-mask dropping spots whose mean distance to their
    ``n_neighbors`` nearest neighbors is above the given quantile
    (slideseq_prediction.py:110-136 pattern)."""
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=n_neighbors + 1).fit(coords)
    dists, _ = nn.kneighbors(coords)
    mean_d = dists[:, 1:].mean(axis=1)
    return mean_d <= np.quantile(mean_d, quantile)


def rotate_coords(coords: np.ndarray, degrees: float) -> np.ndarray:
    """Rotate 2-D coords about their centroid (coarse manual pre-alignment,
    slideseq_prediction.py / macosko two_slice_alignment.py:28-80)."""
    theta = np.deg2rad(degrees)
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    c = coords.mean(axis=0, keepdims=True)
    return (coords - c) @ R.T + c


# ---------------------------------------------------------------------------
# Synthetic stand-ins (same shapes/structure as the real datasets)
# ---------------------------------------------------------------------------


def _gp_expression(coords: np.ndarray, n_genes: int, rng, lengthscale=1.0, noise=0.1):
    K = rbf_kernel_numpy(
        coords, coords, np.array([np.log(1.0), np.log(lengthscale)])
    )
    L = np.linalg.cholesky(K + 1e-4 * np.eye(coords.shape[0]))
    F = L @ rng.standard_normal((coords.shape[0], n_genes))
    return F + noise * rng.standard_normal(F.shape)


def synthetic_visium_like(
    n_spots: int = 800, n_genes: int = 50, n_slices: int = 2, seed: int = 0
):
    """Two hex-ish slices of shared GP expression with a smooth warp between
    them — stand-in for the Visium mouse-brain pair."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 10, (n_spots, 2))
    # short-lengthscale expression: sharp spatial structure pins the warp
    # (overly smooth stand-in genes leave the m=200 warp under-constrained
    # and the free view can drift)
    Y0 = _gp_expression(base / 2.0, n_genes, rng, lengthscale=0.5)
    coords_list, counts_list = [], []
    for s in range(n_slices):
        if s == 0:
            coords_list.append(base.copy())
        else:
            Kw = rbf_kernel_numpy(base, base, np.array([np.log(0.5), np.log(5.0)]))
            Lw = np.linalg.cholesky(Kw + 1e-8 * np.eye(n_spots))
            coords_list.append(base + Lw @ rng.standard_normal((n_spots, 2)))
        counts_list.append(Y0 + 0.05 * rng.standard_normal(Y0.shape))
    return coords_list, counts_list


def synthetic_slideseq_like(
    n_beads: int = 3000, n_genes: int = 30, seed: int = 0, rotation: float = 20.0
):
    """Two dense circular pucks with a rotation + smooth warp and a few
    far-flung outlier beads — stand-in for the Slide-seq hippocampus pair."""
    rng = np.random.default_rng(seed)
    r = np.sqrt(rng.uniform(0, 1, n_beads)) * 5.0
    th = rng.uniform(0, 2 * np.pi, n_beads)
    base = np.stack([5 + r * np.cos(th), 5 + r * np.sin(th)], 1)
    Y0 = _gp_expression(base / 2.0, n_genes, rng, lengthscale=1.0)
    coords2 = rotate_coords(base, rotation)
    sub = rng.choice(n_beads, max(200, n_beads // 10), replace=False)
    Kw = rbf_kernel_numpy(base[sub], base[sub], np.array([np.log(0.3), np.log(5.0)]))
    # low-rank smooth warp from a subset (keeps the host-side MVN cheap)
    Lw = np.linalg.cholesky(Kw + 1e-8 * np.eye(len(sub)))
    w_sub = Lw @ rng.standard_normal((len(sub), 2))
    from scipy.interpolate import RBFInterpolator

    warp = RBFInterpolator(base[sub], w_sub, smoothing=1e-3)
    coords2 = coords2 + warp(coords2)
    # outliers
    n_out = n_beads // 100
    out_idx = rng.choice(n_beads, n_out, replace=False)
    coords2[out_idx] += rng.uniform(8, 15, (n_out, 2))
    return [base, coords2], [Y0, Y0 + 0.05 * rng.standard_normal(Y0.shape)]


def synthetic_st_like(
    n_slices: int = 4, grid_size: int = 12, n_genes: int = 40, seed: int = 0
):
    """n_slices serial sections sharing expression with per-slice GP warps —
    stand-in for the 4-layer breast-cancer ST stack."""
    rng = np.random.default_rng(seed)
    ax = np.linspace(0, 10, grid_size)
    G1, G2 = np.meshgrid(ax, ax)
    base = np.stack([G1.ravel(), G2.ravel()], 1)
    Y0 = _gp_expression(base / 2.0, n_genes, rng, lengthscale=1.0)
    coords_list, counts_list = [], []
    for s in range(n_slices):
        Kw = rbf_kernel_numpy(base, base, np.array([np.log(0.5), np.log(5.0)]))
        Lw = np.linalg.cholesky(Kw + 1e-8 * np.eye(base.shape[0]))
        warp = Lw @ rng.standard_normal((base.shape[0], 2)) if s else 0.0
        coords_list.append(base + warp)
        counts_list.append(Y0 + 0.05 * rng.standard_normal(Y0.shape))
    return coords_list, counts_list
