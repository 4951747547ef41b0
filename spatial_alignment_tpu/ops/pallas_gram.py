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
tests/test_pallas.py). ``gram``'s auto dispatch resolves to the jnp
(XLA expansion-form) path at EVERY size as of round 5 — the loop-in-jit
bandwidth-roof A/B (gram_large_ab.json) showed the earlier per-call window
was dispatch-noise; the kernel stays as an exact opt-in (see the dispatch
note below).
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


_DIM_PAD = 8  # coordinate rows padded to one f32 sublane tile


def _gram_kernel_body(kind, params_ref, x1t_ref, x2t_ref, out_ref):
    """out[i, j] = kernel(x1[:, i], x2[:, j]).

    Lane-aligned layout: coordinates are transposed to (8, M) / (8, TN) with
    zero-padded dimension rows (zeros contribute nothing to the distance), so
    the big axes M / N sit in the 128-lane dimension.
    params (SMEM): [[log_lengthscale, log_variance]].

    All arithmetic is f32 in VMEM regardless of the output dtype; a bf16
    ``out_ref`` only rounds the final store — measured as a halved-write
    lever and rejected (still 0.56-0.78x of the XLA arm at every size,
    gram_large_ab.json; kept so HBM-pressure-bound opt-in callers can
    halve the tensor's footprint).
    """
    log_ls = params_ref[0, 0]
    log_var = params_ref[0, 1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for d in range(_DIM_PAD):  # static unroll; padded rows add exact zeros
        diff = x1t_ref[d, :][:, None] - x2t_ref[d, :][None, :]
        acc += diff * diff
    inv_ls2 = jnp.exp(-2.0 * log_ls)
    var = jnp.exp(log_var)
    if kind == "rbf":
        out = var * jnp.exp(-0.5 * acc * inv_ls2)
    elif kind == "matern12":
        dists = jnp.sqrt(acc + 1e-10)
        out = var * jnp.exp(-0.5 * dists * jnp.exp(-log_ls))
    else:  # matern32
        dists = jnp.sqrt(acc + 1e-10)
        inner = np.float32(np.sqrt(3.0)) * dists * jnp.exp(-log_ls)
        out = var * (1.0 + inner) * jnp.exp(-inner)
    out_ref[:] = out.astype(out_ref.dtype)


def _pallas_gram_2d(
    x1: jnp.ndarray,  # (M, D)
    x2: jnp.ndarray,  # (N, D)
    log_ls: jnp.ndarray,
    log_var: jnp.ndarray,
    kind: str,
    tile_n: int = 512,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    M, D = x1.shape
    N = x2.shape[0]
    Mp = _round_up(max(M, SUBLANE), SUBLANE)
    Np = _round_up(max(N, LANE), LANE)
    tile = min(tile_n, Np)
    Np = _round_up(Np, tile)

    # Transpose to (D, ...) then pad: dim rows with zeros (contribute 0 to the
    # distance), point columns far away so padded entries give ~0 kernel
    # values (sliced off below anyway).
    x1t = jnp.pad(x1.T, ((0, _DIM_PAD - D), (0, Mp - M)), constant_values=0.0)
    x1t = x1t.at[:D, M:].set(1e6) if Mp > M else x1t
    x2t = jnp.pad(x2.T, ((0, _DIM_PAD - D), (0, Np - N)), constant_values=0.0)
    x2t = x2t.at[:D, N:].set(-1e6) if Np > N else x2t
    params = jnp.reshape(
        jnp.stack([jnp.reshape(log_ls, ()), jnp.reshape(log_var, ())]), (1, 2)
    ).astype(jnp.float32)

    body = functools.partial(_gram_kernel_body, kind)
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec((_DIM_PAD, Mp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_DIM_PAD, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, x1t, x2t)
    return out[:M, :N]


def pallas_gram(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    log_ls,
    log_var,
    kind: str = "rbf",
    tile_n: int = 512,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Cross-Gram k(x1, x2) with leading batch dims on x2 (vmapped)."""
    if x2.ndim == 2:
        return _pallas_gram_2d(
            x1, x2, log_ls, log_var, kind, tile_n, interpret, out_dtype
        )
    fn = lambda b: pallas_gram(
        x1, b, log_ls, log_var, kind, tile_n, interpret, out_dtype
    )
    return jax.vmap(fn)(x2)


# Dispatch decision (round 5): "auto" NEVER dispatches the kernel.
# The round-3 per-call A/B (pallas_ab.json) measured a [256K, 32M]-element
# window where the kernel won 1.27x — but per-call timing through the axon
# tunnel has a ~23 ms dispatch floor that swamps a sub-ms op. The round-5
# harness (experiments/simulations/gram_large_ab.py: reps inside one jitted
# fori_loop, optimization_barrier-materialized output, rep-count-differenced)
# measures XLA's expansion-form lowering at ~48-54% of the 819 GB/s HBM roof
# across 1M-100M output elements, with the kernel at 0.41-0.78x of it
# everywhere — INCLUDING inside the old window (gram_large_ab.json). A bf16
# output store (halving write bytes, the only remaining lever in the
# HBM-write-bound regime) still loses (0.56-0.78x) while costing 2e-3 rel
# error, so no bf16-Kuf consumer path is warranted either. Mechanism: the
# kernel's (8, M) x (8, TN) broadcast-subtract distance runs on the VPU,
# while XLA's expansion form rides the MXU for the cross term and fuses the
# exp into the output loop — at every size the op is compute-side-limited
# below the write roof, and the MXU version has more arithmetic throughput.
# The kernel remains exact (3.5e-6 vs f64) and available via force=True /
# set_gram_force for HBM-pressure-bound uses; step-level throughput was
# always neutral to the choice (gram is a few % of step time).
_PALLAS_MIN_ELEMS = 256 * 1024  # retained for the opt-in's shape sanity
_PALLAS_MAX_ELEMS = 32 * 1024 * 1024

# Process-wide dispatch override for A/B benchmarking (None = size dispatch).
# Consulted at TRACE time: set it before building a jitted function.
_FORCE_OVERRIDE: Optional[bool] = None


def set_gram_force(force: Optional[bool]) -> None:
    """Override Pallas-vs-jnp dispatch globally (None restores size dispatch)."""
    global _FORCE_OVERRIDE
    _FORCE_OVERRIDE = force


def _gram_fwd_impl(x1, x2, log_ls, log_var, kind, force):
    use = force
    if use is None and _FORCE_OVERRIDE is not None:
        use = _FORCE_OVERRIDE and _HAS_PALLAS and x1.ndim == 2
    if use is None:
        # Round-5 measurement: XLA's expansion form wins at every size
        # (see the window note above) — auto never dispatches the kernel.
        use = False
    if use:
        return pallas_gram(x1, x2, log_ls, log_var, kind)
    kern = get_kernel(kind)
    x1b = x1
    if x2.ndim > 2 and x1.ndim == 2:
        x1b = x1[(None,) * (x2.ndim - 2)]
    return kern(x1b, x2, log_ls, log_var)


def _sqdist(x1, x2):
    # x1 (m, D); x2 (..., N, D) -> (..., m, N)
    n1 = jnp.sum(jnp.square(x1), axis=-1)
    n2 = jnp.sum(jnp.square(x2), axis=-1)
    cross = jnp.einsum(
        "md,...nd->...mn", x1, x2, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(n1[..., :, None] + n2[..., None, :] - 2.0 * cross, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gram(x1, x2, log_ls, log_var, kind: str = "rbf", force: Optional[bool] = None):
    """Differentiable dispatching cross-Gram K[..., i, j] = k(x1[i], x2[..., j]).

    Forward: fused Pallas kernel on TPU for large shapes, jnp otherwise
    (``force`` overrides). Backward: closed-form cotangents in matmul form —
    no (m, N, D) difference tensor materializes in either pass, unlike
    autodiff through the broadcast formulation.
    """
    return _gram_fwd_impl(x1, x2, log_ls, log_var, kind, force)


def _gram_vjp_fwd(x1, x2, log_ls, log_var, kind, force):
    K = _gram_fwd_impl(x1, x2, log_ls, log_var, kind, force)
    return K, (x1, x2, jnp.asarray(log_ls), jnp.asarray(log_var), K)


def _gram_vjp_bwd(kind, force, res, g):
    x1, x2, log_ls, log_var, K = res
    ls = jnp.exp(jnp.reshape(log_ls, ()))
    sq = _sqdist(x1, x2)  # (..., m, N)

    if kind == "rbf":
        W = g * K  # dK/d(pairwise diff) weight
        # K = v exp(-0.5 sq / ls^2)
        coef = W / jnp.square(ls)  # per-pair weight on (x1_i - x2_j)
        g_ll = jnp.sum(W * sq) / jnp.square(ls)
    elif kind == "matern12":
        d = jnp.sqrt(sq + 1e-10)
        W = g * K
        coef = 0.5 * W / (ls * d)
        g_ll = jnp.sum(W * 0.5 * d / ls)
    elif kind == "matern32":
        d = jnp.sqrt(sq + 1e-10)
        a = np.sqrt(3.0) * d / ls
        v = jnp.exp(jnp.reshape(log_var, ()))
        dKda = -v * a * jnp.exp(-a)  # d[v(1+a)e^-a]/da
        W = g * dKda
        coef = -W * np.sqrt(3.0) / (ls * d)  # chain: da/dd * dd/ddiff direction
        g_ll = jnp.sum(-W * a)
    else:
        raise ValueError(f"unknown kernel kind {kind!r}")

    # grad through the (x1_i - x2_j) geometry, in matmul form:
    #   g_x1[i] = -sum_j coef_ij (x1_i - x2_j);  g_x2[j] = +sum_i coef_ij (...)
    row = jnp.sum(coef, axis=-1)  # (..., m)
    col = jnp.sum(coef, axis=-2)  # (..., N)
    cx2 = jnp.einsum("...mn,...nd->...md", coef, x2, precision=jax.lax.Precision.HIGHEST)
    cx1 = jnp.einsum("...mn,md->...nd", coef, x1, precision=jax.lax.Precision.HIGHEST)
    g_x1 = -(row[..., :, None] * x1 - cx2)
    g_x2 = -(col[..., :, None] * x2 - cx1)
    # sum the batch dims x1 was broadcast over
    if g_x1.ndim > x1.ndim:
        g_x1 = jnp.sum(g_x1, axis=tuple(range(g_x1.ndim - x1.ndim)))
    g_lv = jnp.sum(g * K)  # every kernel scales linearly with v = exp(log_var)

    res_ls, res_lv = res[2], res[3]
    return (
        g_x1,
        g_x2,
        jnp.reshape(g_ll, res_ls.shape).astype(res_ls.dtype),
        jnp.reshape(g_lv, res_lv.shape).astype(res_lv.dtype),
    )


gram.defvjp(_gram_vjp_fwd, _gram_vjp_bwd)
