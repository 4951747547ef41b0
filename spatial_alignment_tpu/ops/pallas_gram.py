"""Pallas TPU kernel: fused cross-Gram matrix construction.

The FLOP/bandwidth peak of the model at real-data scale is the S-batched
cross-kernel tensor Kuf = k(inducing, points) — the analog of the reference's
``kernel_G(X_tilde, X_spatial)`` / ``kernel_F(Gtilde, G_samples)`` calls
(/root/reference/gpsa/models/vgpsa.py:318,409). For Slide-seq-scale inputs
(N ~ 10-50k spots, m ~ 200 inducing points, S Monte-Carlo samples) the naive
path materializes an (S, m, N, D) difference tensor in HBM; this kernel tiles
the point axis into VMEM blocks and fuses distance computation with the
kernel's exponential so each output element is produced in one pass.

Spatial dimensionality D is tiny (2-3), so distances are computed on the VPU
with a statically unrolled loop over D — an MXU matmul with a contraction of
2 would waste the systolic array and this op is bandwidth-bound anyway.

A jnp fallback keeps CPU/interpret semantics identical (tested in
tests/test_pallas.py); ``gram`` dispatches on backend + size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import get_kernel

try:  # pallas import can fail on unsupported platforms; fall back to jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gram_kernel_body(kind, n_dims, params_ref, x1_ref, x2_ref, out_ref):
    """out[i, j] = kernel(x1[i], x2[j]).

    x1: (M, D) full block; x2: (TN, D) tile; out: (M, TN) tile.
    params (SMEM): [log_lengthscale, log_variance].
    """
    log_ls = params_ref[0]
    log_var = params_ref[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(n_dims):  # static unroll: D is 1-3
        diff = x1_ref[:, d][:, None] - x2_ref[:, d][None, :]
        acc += diff * diff
    inv_ls2 = jnp.exp(-2.0 * log_ls)
    var = jnp.exp(log_var)
    if kind == "rbf":
        out_ref[:] = var * jnp.exp(-0.5 * acc * inv_ls2)
    elif kind == "matern12":
        dists = jnp.sqrt(acc + 1e-10)
        out_ref[:] = var * jnp.exp(-0.5 * dists * jnp.exp(-log_ls))
    else:  # matern32
        dists = jnp.sqrt(acc + 1e-10)
        inner = np.sqrt(3.0).astype(np.float32) * dists * jnp.exp(-log_ls)
        out_ref[:] = var * (1.0 + inner) * jnp.exp(-inner)


def _pallas_gram_2d(
    x1: jnp.ndarray,  # (M, D)
    x2: jnp.ndarray,  # (N, D)
    log_ls: jnp.ndarray,
    log_var: jnp.ndarray,
    kind: str,
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    M, D = x1.shape
    N = x2.shape[0]
    Mp = _round_up(max(M, SUBLANE), SUBLANE)
    Np = _round_up(max(N, LANE), min(tile_n, _round_up(N, LANE)))
    Np = _round_up(Np, LANE)
    tile = min(tile_n, Np)

    # Pad far away so padded rows/cols produce ~0 kernel values (harmless,
    # sliced off below anyway).
    x1p = jnp.pad(x1, ((0, Mp - M), (0, 0)), constant_values=1e6)
    x2p = jnp.pad(x2, ((0, Np - N), (0, 0)), constant_values=-1e6)
    params = jnp.stack(
        [jnp.reshape(log_ls, ()), jnp.reshape(log_var, ())]
    ).astype(jnp.float32)

    body = functools.partial(_gram_kernel_body, kind, D)
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec((Mp, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, x1p, x2p)
    return out[:M, :N]


def pallas_gram(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    log_ls,
    log_var,
    kind: str = "rbf",
    tile_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cross-Gram k(x1, x2) with leading batch dims on x2 (vmapped)."""
    if x2.ndim == 2:
        return _pallas_gram_2d(x1, x2, log_ls, log_var, kind, tile_n, interpret)
    fn = lambda b: pallas_gram(x1, b, log_ls, log_var, kind, tile_n, interpret)
    return jax.vmap(fn)(x2)


# Minimum output elements before the pallas path pays for itself; below this
# XLA's fused jnp path is already optimal.
_PALLAS_MIN_ELEMS = 256 * 1024


def gram(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    log_ls,
    log_var,
    kind: str = "rbf",
    force: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching cross-Gram: pallas on TPU for large shapes, jnp otherwise.

    ``force=True/False`` overrides the heuristic (used by tests/benchmarks).
    """
    use = force
    if use is None:
        n_out = int(np.prod(x1.shape[:-1])) * int(np.prod(x2.shape[:-1]))
        use = (
            _HAS_PALLAS
            and jax.default_backend() == "tpu"
            and x1.ndim == 2
            and n_out >= _PALLAS_MIN_ELEMS
        )
    if use:
        return pallas_gram(x1, x2, log_ls, log_var, kind)
    kern = get_kernel(kind)
    if x2.ndim > 2 and x1.ndim == 2:
        x1 = x1[(None,) * (x2.ndim - 2)]
    return kern(x1, x2, log_ls, log_var)
