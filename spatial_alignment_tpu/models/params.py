"""Parameter-pytree construction and initialization.

The reference's learned state is a pile of ``nn.Parameter``s on a stateful
module (/root/reference/gpsa/models/gpsa.py:86-153, vgpsa.py:61-172). Here it
is two plain dict pytrees:

  params  — trainable leaves (flow through jit/grad/optax)
  consts  — frozen hyperparameters (fixed kernel params, identity warp means)

Initialization distribution parity (same shapes and scales as the reference;
exact values differ because torch and jax RNGs differ — parity is defined at
convergence, SURVEY.md §7):

  noise_variance            randn(n_noise) - 1                 gpsa.py:86-88
  warp_kernel_variances     zeros(V)                           gpsa.py:95-97
  warp_kernel_lengthscales  zeros(V) + log(10)                 gpsa.py:107-109
  data_kernel_lengthscale   randn(1)                           gpsa.py:116-118
  data_kernel_variance      randn(1)                           gpsa.py:124
  mean_slopes/intercepts    per mean_function                  gpsa.py:128-150
  Xtilde / Gtilde           kmeans | grid | randn              vgpsa.py:61-128
  Omega_sqt_G               0.1 * randn, stored (V, D, m, m)   vgpsa.py:131-143*
  Omega_sqt_F[mod]          0.1 * randn (L, m_G, m_G)          vgpsa.py:145-153
  delta_G                   Xtilde.copy()                      vgpsa.py:156
  delta_F[mod]              randn(m_G, L)                      vgpsa.py:157-164
  W[mod]                    randn(L, P) if LMC                 vgpsa.py:166-172

(*) The reference stores Omega_sqt_G dimension-major (jj*n_views+ii) but
slices it view-major when sampling — inconsistent unless V == D (SURVEY.md
§2.4.3). We use one consistent (view, dim, m, m) layout throughout.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .spec import ModelSpec, _as_numpy, view_slices


def _kmeans_centers(x: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Host-side k-means for inducing-point init (reference uses sklearn,
    vgpsa.py:74-91). Runs once at construction, outside jit. Above 20k points
    exact KMeans takes minutes on one core, so switch to MiniBatchKMeans —
    inducing inits only need cluster centers that cover the point cloud, and
    the variational optimization moves them anyway (Xtilde/Gtilde are learned
    parameters)."""
    if x.shape[0] <= k:
        # Not enough points to cluster; tile the data.
        reps = -(-k // x.shape[0])
        return np.tile(x, (reps, 1))[:k]
    if x.shape[0] > 20_000:
        from sklearn.cluster import MiniBatchKMeans

        km = MiniBatchKMeans(
            n_clusters=k, n_init=3, batch_size=4096, random_state=seed
        )
    else:
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=k, n_init=10, random_state=seed)
    km.fit(x)
    return km.cluster_centers_.astype(np.float32)


def init_inducing(
    spec: ModelSpec,
    data_dict: Optional[Dict[str, dict]],
    *,
    data_init: bool = True,
    grid_init: bool = False,
    seed: int = 0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, ModelSpec]:
    """Xtilde (V, m_X, D), Gtilde (m_G, D). May update spec (grid_init rounds
    m up to a square; vgpsa.py:94-121)."""
    rng = rng or np.random.default_rng(seed)
    V, D = spec.n_views, spec.n_spatial_dims

    if data_init and data_dict is not None:
        Xtilde = np.zeros((V, spec.m_X_per_view, D), np.float32)
        for v in range(V):
            pieces = []
            for mod in spec.modalities:
                x = _as_numpy(data_dict[mod.name]["spatial_coords"])
                lo, hi = view_slices(mod.n_samples)[v]
                pieces.append(x[lo:hi])
            xv = np.concatenate(pieces, axis=0).astype(np.float32)
            Xtilde[v] = _kmeans_centers(xv, spec.m_X_per_view, seed + v)
        all_x = np.concatenate(
            [_as_numpy(data_dict[m]["spatial_coords"]) for m in spec.modality_names],
            axis=0,
        ).astype(np.float32)
        Gtilde = _kmeans_centers(all_x, spec.m_G, seed + 1000)
        return Xtilde, Gtilde, spec

    if grid_init and data_dict is not None:
        first = _as_numpy(data_dict[spec.modality_names[0]]["spatial_coords"])
        lows, highs = first.min(0), first.max(0)
        if D == 1:
            grid = np.linspace(lows[0], highs[0], spec.m_G).reshape(-1, 1)
            grid = grid.astype(np.float32)
            m = spec.m_G
        elif D == 2:
            # rounds m up to a square (parity: vgpsa.py:105-107)
            numticks = int(np.ceil(np.sqrt(spec.m_G)))
            m = numticks**2
            x1 = np.linspace(lows[0], highs[0], numticks)
            x2 = np.linspace(lows[1], highs[1], numticks)
            G1, G2 = np.meshgrid(x1, x2)
            grid = np.vstack([G1.ravel(), G2.ravel()]).T.astype(np.float32)
        else:
            raise ValueError("grid_init supports 1 or 2 spatial dims")
        Xtilde = np.tile(grid[None], (V, 1, 1))
        spec = spec.replace(m_G=m, m_X_per_view=m)
        return Xtilde, grid, spec

    Xtilde = rng.standard_normal((V, spec.m_X_per_view, D)).astype(np.float32)
    Gtilde = rng.standard_normal((spec.m_G, D)).astype(np.float32)
    return Xtilde, Gtilde, spec


def init_params(
    spec: ModelSpec,
    data_dict: Optional[Dict[str, dict]] = None,
    *,
    data_init: bool = True,
    grid_init: bool = False,
    seed: int = 0,
    fixed_warp_kernel_variances=None,
    fixed_warp_kernel_lengthscales=None,
    fixed_data_kernel_lengthscales=None,
) -> Tuple[dict, dict, ModelSpec]:
    """Build (params, consts, possibly-updated spec)."""
    rng = np.random.default_rng(seed)
    V, D = spec.n_views, spec.n_spatial_dims

    Xtilde, Gtilde, spec = init_inducing(
        spec, data_dict, data_init=data_init, grid_init=grid_init, seed=seed, rng=rng
    )
    m_X, m_G = spec.m_X_per_view, spec.m_G

    params: dict = {}
    consts: dict = {}

    def randn(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    params["noise_variance"] = randn(spec.n_noise_variance_params) - 1.0

    if spec.fixed_warp_kernel_variances:
        consts["warp_kernel_variances"] = np.log(
            np.asarray(fixed_warp_kernel_variances, np.float32)
        )
    else:
        params["warp_kernel_variances"] = np.zeros(V, np.float32)

    if spec.fixed_warp_kernel_lengthscales:
        consts["warp_kernel_lengthscales"] = np.log(
            np.asarray(fixed_warp_kernel_lengthscales, np.float32)
        )
    else:
        params["warp_kernel_lengthscales"] = np.zeros(V, np.float32) + np.float32(
            np.log(10.0)
        )

    if spec.fixed_data_kernel_lengthscales:
        consts["data_kernel_lengthscale"] = np.log(
            np.asarray(fixed_data_kernel_lengthscales, np.float32).reshape(-1)
        )
    else:
        params["data_kernel_lengthscale"] = randn(1)

    params["data_kernel_variance"] = randn(1)

    eyeVDD = np.tile(np.eye(D, dtype=np.float32)[None], (V, 1, 1))
    if spec.mean_function == "identity_fixed":
        consts["mean_slopes"] = eyeVDD
        consts["mean_intercepts"] = np.zeros((V, D), np.float32)
    elif spec.mean_function == "identity_initialized":
        params["mean_slopes"] = randn(V, D, D)
        params["mean_intercepts"] = np.zeros((V, D), np.float32)
    else:  # linear mean, learned around identity (gpsa.py:145-150)
        params["mean_slopes"] = eyeVDD.copy()
        params["mean_intercepts"] = 0.1 * randn(V, D)

    def variational_factor(a: np.ndarray) -> np.ndarray:
        """Initial Omega factor. Square mode stores the raw 0.1*randn factor
        (vgpsa.py:131-153). Triangular mode stores chol(a a^T + jitter*I) —
        the exact Cholesky of the square-mode initial covariance, so both
        parameterizations start from the identical q distribution. Whitened
        mode stores the identity: q(w) = N(., I), i.e. posterior covariance
        = prior covariance — the standard whitened-SVGP init."""
        if spec.whitened_variational:
            eye = np.eye(a.shape[-1], dtype=np.float32)
            return np.broadcast_to(eye, a.shape).copy()
        if not spec.triangular_variational:
            return a
        m = a @ np.swapaxes(a, -1, -2)
        diag_mean = np.maximum(
            1.0, np.trace(m, axis1=-2, axis2=-1).astype(np.float64) / m.shape[-1]
        )
        eye = np.eye(m.shape[-1], dtype=np.float64)
        jit = spec.diagonal_offset * diag_mean[..., None, None] * eye
        return np.linalg.cholesky(m.astype(np.float64) + jit).astype(np.float32)

    params["Xtilde"] = Xtilde
    params["Gtilde"] = Gtilde
    # Whitened mode: delta_G is the whitened mean w = L^-1 (u - mu_z); zero
    # means posterior warp mean == prior mean (identity map) — the exact
    # analog of the reference's delta = Xtilde init under identity means.
    params["delta_G"] = (
        np.zeros_like(Xtilde) if spec.whitened_variational else Xtilde.copy()
    )
    params["Omega_sqt_G"] = variational_factor(0.1 * randn(V, D, m_X, m_X))

    params["Omega_sqt_F"] = {}
    params["delta_F"] = {}
    params["W"] = {}
    for mod in spec.modalities:
        L = mod.n_latent
        params["Omega_sqt_F"][mod.name] = variational_factor(0.1 * randn(L, m_G, m_G))
        params["delta_F"][mod.name] = randn(m_G, L)
        if mod.use_lmc:
            params["W"][mod.name] = randn(L, mod.n_outputs)

    params = jax.tree.map(jnp.asarray, params)
    consts = jax.tree.map(jnp.asarray, consts)
    return params, consts, spec


def merge_hyperparams(params: dict, consts: dict) -> dict:
    """Single namespace view over trainable + frozen leaves."""
    merged = dict(params)
    merged.update(consts)
    return merged
