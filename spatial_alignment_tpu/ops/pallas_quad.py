"""Pallas TPU kernel: fused diag quadratic forms sum_k (x @ F_b)^2.

The SVGP predictive variance needs, per output channel b,
``aOa[..., b, n] = || xT[..., n, :] @ F_b ||^2`` (svgp_mean_var's
``_quad_diag``; the reference materializes the same quantity through
torch.einsum at /root/reference/gpsa/models/vgpsa.py:196-204). At the
real-data scale (S=5, N=4050, L=10, m=200) the XLA lowering materializes
the (S, N, L, m) product tensor ``t`` in HBM — 162 MB written once and
read ~3x more across the reduce and the VJP's two contractions (~650 MB of
traffic per step; the three fusions carrying it are ~39% of device step
time, op_profile_visium.json / /tmp profile of the mixed-mode step).

This kernel is the flash-attention-style fix: tile the point axis, keep
``t`` for one (tile_n, m) block in VMEM, reduce it on the spot, and in the
custom VJP *recompute* that block instead of reloading it — HBM traffic
drops to reading x twice + writing dx once (~50 MB at the config above).
The contraction itself rides the MXU at a caller-chosen precision
(``jax.lax.Precision``), matching the library's svgp_{matmul,variance}
_precision semantics.

Layout notes (see /opt/skills/guides/pallas_guide.md):
* grid = (G, N_tiles) with G = flattened leading batch dims of x; the
  channel loop (L <= _MAX_L) is statically unrolled inside the kernel, so
  every MXU call is a fat (tile_n, m) x (m, m) matmul.
* dF accumulates across ALL grid steps into one VMEM-resident (L, m, m)
  block (constant index_map; TPU grid steps are sequential), initialized at
  the first program — the standard revisited-output reduction pattern.
* All padding is exact: zero rows of x produce zero rows of t (zero
  contribution to every output), so no masking is needed.

MEASURED OUTCOME (real TPU, experiments/out/quad_pallas_step_ab.json):
the kernel is numerically exact (1.8e-7 rel fwd, 6.4e-7 vjp at f32) but
LOSES to XLA's fused lowering at the very config it targets — 371 vs 397
steps/s at 1-pass variance precision, 282 vs 342 at 3-pass. The per-tile
channel loop issues 10 skinny (512, m) x (m, m) dots per grid step where
XLA pipelines one fat reshaped contraction, and the HBM traffic it saves
is already hidden by XLA's fusion overlap at this arithmetic intensity.
``ModelSpec.quad_diag_impl="auto"`` therefore resolves to "xla"; the
kernel stays as an explicit opt-in ("pallas") and as the recorded bound
for this optimization direction (same protocol as the rejected Pallas
triangular solve, ops/pallas_trisolve.py). Distributed models are pinned
to "xla" by ``parallel.distribute()`` regardless — the point axis is the
sharded axis and this kernel has no custom_partitioning rule.

The jnp fallback below is numerically identical math (same contraction
order) for CPU/interpret and small shapes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import can fail on unsupported platforms; fall back to jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["quad_diag", "set_quad_force", "QUAD_PALLAS_MIN_ELEMS"]

_SUBLANE = 8
_TILE_N = 512

# Trace-time dispatch gates. The kernel's win is proportional to the HBM
# traffic of the materialized (G, L, N, m) product tensor, so it engages
# only where that tensor is large; below the floor XLA's fused path is
# latency-optimal already (the north-star config's biggest quad slab is
# ~0.5M elements and measured flat). Step-level A/B:
# experiments/out/quad_pallas_step_ab.json.
QUAD_PALLAS_MIN_ELEMS = 2 * 1024 * 1024
_MAX_L = 32
_MAX_VMEM_F_BYTES = 6 * 1024 * 1024  # F + dF resident slabs

# Process-wide dispatch override for A/B benchmarking (None = size dispatch).
_FORCE_OVERRIDE: Optional[bool] = None


def set_quad_force(force: Optional[bool]) -> None:
    """Override Pallas-vs-jnp dispatch globally (None restores size dispatch).

    Trace-time only — set before building a jitted function.
    """
    global _FORCE_OVERRIDE
    _FORCE_OVERRIDE = force


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot_prec(a, b, dims, precision: str):
    """dot_general at the library's precision labels, inside Mosaic.

    Mosaic rejects ``lax.Precision.HIGH`` (measured: "Unsupported dot
    precision: HIGH"), so "high" is spelled out as the standard bf16 3-pass
    decomposition a_hi b_hi + a_hi b_lo + a_lo b_hi (what XLA:TPU's HIGH
    lowers to); "default" is an explicit 1-pass bf16 cast; "highest" uses
    the native f32 path (verified 1.8e-7 rel vs XLA on real TPU,
    experiments/out/quad_pallas_step_ab.json tpu_numerics).
    """
    # The bf16 dots pin precision=DEFAULT explicitly: the library wraps the
    # whole ELBO in jax.default_matmul_precision("highest"), and a None
    # precision would inherit that ambient HIGHEST — which Mosaic rejects
    # for bf16 operands ("Bad lhs type").
    d = lambda x, y, p: jax.lax.dot_general(
        x, y, dims, precision=p, preferred_element_type=jnp.float32
    )
    if precision == "highest":
        return d(a, b, jax.lax.Precision.HIGHEST)
    bf = jnp.bfloat16
    if precision == "default":
        return d(a.astype(bf), b.astype(bf), jax.lax.Precision.DEFAULT)
    ah = a.astype(bf)
    al = (a - ah.astype(jnp.float32)).astype(bf)
    bh = b.astype(bf)
    bl = (b - bh.astype(jnp.float32)).astype(bf)
    dd = lambda x, y: d(x, y, jax.lax.Precision.DEFAULT)
    return dd(ah, bh) + (dd(ah, bl) + dd(al, bh))


def _fwd_body(L, prec, x_ref, f_ref, o_ref):
    x = x_ref[0]  # (tile_n, m)
    for b in range(L):  # static unroll: one fat MXU matmul per channel
        t = _dot_prec(x, f_ref[b], (((1,), (0,)), ((), ())), prec)
        o_ref[0, b, :] = jnp.sum(t * t, axis=-1)


def _bwd_body(L, prec, x_ref, f_ref, dy_ref, dx_ref, df_ref):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        df_ref[...] = jnp.zeros_like(df_ref)

    x = x_ref[0]  # (tile_n, m)
    acc = jnp.zeros(x.shape, jnp.float32)
    for b in range(L):
        # recompute this tile's t block in VMEM — never reloaded from HBM
        t = _dot_prec(x, f_ref[b], (((1,), (0,)), ((), ())), prec)
        w = (2.0 * dy_ref[0, b, :])[:, None] * t  # (tile_n, m)
        # dx += w @ F_b^T  (contract the j axes; no transpose materialized)
        acc += _dot_prec(w, f_ref[b], (((1,), (1,)), ((), ())), prec)
        # dF_b += x^T @ w  (contract the tile axes)
        df_ref[b, :, :] += _dot_prec(x, w, (((0,), (0,)), ((), ())), prec)
    dx_ref[0] = acc


def _pad_points(a: jnp.ndarray, Np: int) -> jnp.ndarray:
    """Zero-pad the second-to-last axis... (G, N, m) -> (G, Np, m)."""
    N = a.shape[1]
    if Np == N:
        return a
    return jnp.pad(a, ((0, 0), (0, Np - N), (0, 0)))


def _fwd_pallas(x, F, precision: str, tile_n: int, interpret: bool):
    G, N, m = x.shape
    L = F.shape[0]
    tile = min(tile_n, _round_up(max(N, _SUBLANE), _SUBLANE))
    Np = _round_up(max(N, tile), tile)
    xp = _pad_points(x, Np)
    body = functools.partial(_fwd_body, L, precision)
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((G, L, Np), jnp.float32),
        grid=(G, Np // tile),
        in_specs=[
            pl.BlockSpec((1, tile, m), lambda g, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, m, m), lambda g, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, tile), lambda g, j: (g, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, F)
    return out[:, :, :N]


def _bwd_pallas(x, F, dy, precision: str, tile_n: int, interpret: bool):
    G, N, m = x.shape
    L = F.shape[0]
    tile = min(tile_n, _round_up(max(N, _SUBLANE), _SUBLANE))
    Np = _round_up(max(N, tile), tile)
    xp = _pad_points(x, Np)
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, Np - N))) if Np != N else dy
    body = functools.partial(_bwd_body, L, precision)
    dx, dF = pl.pallas_call(
        body,
        out_shape=(
            jax.ShapeDtypeStruct((G, Np, m), jnp.float32),
            jax.ShapeDtypeStruct((L, m, m), jnp.float32),
        ),
        grid=(G, Np // tile),
        in_specs=[
            pl.BlockSpec((1, tile, m), lambda g, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, m, m), lambda g, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, tile), lambda g, j: (g, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, m), lambda g, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, m, m), lambda g, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, F, dyp)
    return dx[:, :N, :], dF


def _quad_jnp(xT: jnp.ndarray, factors: jnp.ndarray, precision: str):
    """XLA fallback — identical contraction order to core._quad_diag."""
    with jax.default_matmul_precision(precision):
        t = jnp.expand_dims(xT, -3) @ factors
    return jnp.sum(jnp.square(t), axis=-1)


def _pallas_ok(xT, factors, interpret: bool) -> bool:
    if not _HAS_PALLAS:
        return False
    if not interpret and jax.default_backend() != "tpu":
        return False
    if factors.ndim != 3 or xT.ndim < 2:
        return False
    if xT.dtype != jnp.float32 or factors.dtype != jnp.float32:
        return False
    L, m = factors.shape[0], factors.shape[-1]
    if factors.shape[-2] != m or xT.shape[-1] != m:
        return False
    if L > _MAX_L or 2 * L * m * m * 4 > _MAX_VMEM_F_BYTES:
        return False
    return True


def _dispatch(xT, factors, precision: str, force, interpret: bool) -> bool:
    use = force
    if use is None and _FORCE_OVERRIDE is not None:
        use = _FORCE_OVERRIDE
    if use is None:
        elems = int(np.prod(xT.shape[:-1])) * int(factors.shape[0]) * int(
            factors.shape[-1]
        )
        use = elems >= QUAD_PALLAS_MIN_ELEMS
    return bool(use) and _pallas_ok(xT, factors, interpret)


def would_dispatch(xT, factors, impl: Optional[str] = None) -> bool:
    """Trace-time dispatch decision, for callers that keep their own jnp
    path when the kernel would not engage (models.core._quad_diag — its
    inline form stays on XLA autodiff, bit-identical to the pre-kernel
    library).

    ``impl``: "xla" forces False (parallel.distribute() pins sharded models
    here — no custom_partitioning rule yet), "pallas" forces the kernel
    whenever it is applicable, None/"auto" uses the size gate (and the
    process-wide ``set_quad_force`` A/B override).
    """
    if impl == "xla":
        return False
    force = True if impl == "pallas" else None
    return _dispatch(xT, factors, "highest", force, False)


def _flatten_leading(xT) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    lead = xT.shape[:-2]
    G = 1
    for s in lead:
        G *= s
    return xT.reshape((G,) + xT.shape[-2:]), lead


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def quad_diag(
    xT: jnp.ndarray,  # (..., N, m)
    factors: jnp.ndarray,  # (L, m, m)
    precision: str = "highest",
    force: Optional[bool] = None,
    tile_n: int = _TILE_N,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``aOa[..., b, n] = sum_k (xT[..., n, :] @ factors[b])[k]^2``.

    Forward: Pallas kernel on TPU for shapes whose materialized product
    tensor is large (``force`` overrides), jnp otherwise. Backward: the
    matching recompute kernel — the (..., L, N, m) intermediate never
    touches HBM in either pass. Returns (..., L, N) float32.
    """
    return _quad_impl(xT, factors, precision, force, tile_n, interpret)


def _quad_impl(xT, factors, precision, force, tile_n, interpret):
    if not _dispatch(xT, factors, precision, force, interpret):
        return _quad_jnp(xT, factors, precision)
    x3, lead = _flatten_leading(xT)
    out = _fwd_pallas(x3, factors, precision, tile_n, interpret)
    return out.reshape(lead + out.shape[-2:])


def _quad_vjp_fwd(xT, factors, precision, force, tile_n, interpret):
    return (
        _quad_impl(xT, factors, precision, force, tile_n, interpret),
        (xT, factors),
    )


def _quad_vjp_bwd(precision, force, tile_n, interpret, res, g):
    xT, factors = res
    if not _dispatch(xT, factors, precision, force, interpret):
        # jnp pullback, same contraction order as autodiff of _quad_jnp
        with jax.default_matmul_precision(precision):
            t = jnp.expand_dims(xT, -3) @ factors  # (..., L, N, m)
            w = 2.0 * t * g[..., None]
            dx = jnp.sum(w @ jnp.swapaxes(factors, -1, -2), axis=-3)
            dF = jnp.einsum("...ni,...bnj->bij", xT, w)
        return dx.astype(xT.dtype), dF.astype(factors.dtype)
    x3, lead = _flatten_leading(xT)
    g3 = g.reshape((x3.shape[0],) + g.shape[-2:])
    dx, dF = _bwd_pallas(x3, factors, g3, precision, tile_n, interpret)
    return dx.reshape(xT.shape), dF


quad_diag.defvjp(_quad_vjp_fwd, _quad_vjp_bwd)
