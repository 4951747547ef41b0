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
``t`` for one block in VMEM, reduce it on the spot, and in the custom VJP
*recompute* that block instead of reloading it — HBM traffic drops to
reading x twice + writing dx once (~50 MB at the config above). The
contraction itself rides the MXU at a caller-chosen precision
(``jax.lax.Precision``), matching the library's svgp_{matmul,variance}
_precision semantics.

KERNEL SHAPE (v2.1, "fat-dot"): all leading batch dims and the point axis
flatten into ONE row axis (grid = rows/tile); the factors are stacked
OUTSIDE the kernel into ``Fcat[i, k*L+b] = F[b, i, k]`` (k-major lanes)
so each grid step is pure fat MXU work with no in-kernel loops, reshapes,
or transposes: forward ``t = x @ Fcat`` then a per-channel lane-group sum
as selector dots (see _sum_per_channel); backward recomputes ``t``,
broadcasts dy with a pure VPU ``pltpu.repeat`` (tile semantics — that is
what k-major lanes buy), and finishes with two fat dots ``dx = w Fcat^T``
(dim1-dim1) and ``dFcat += x^T w``. dFcat accumulates across grid steps
in one VMEM-resident block (constant index_map; TPU grid steps are
sequential), initialized at the first program. Channel-major layout fixes
ride tiny XLA transposes outside the kernel (~1 MB at the real-data
config). Point-padding is exact (zero rows of x contribute zero), and the
point tile halves until the live (tile, m*L) temporaries fit Mosaic's
16 MB scoped-vmem stack (see _pick_tile; undersized tiles were v2.0's
other mistake — tile=128 ran the backward at ~20% MXU efficiency).

Version history, all measured on the real chip at the target config:
v1 (per-channel dot loop) step A/B 371 vs XLA 397 steps/s; v2.0 (fat dots
but HIGHEST-precision selector dots + starved tiles) op-level f+b 1273us
vs XLA 806us; v2.1 (this file) 1073us vs 695us wall / bwd-kernel 477us
device vs XLA-chain 310us device.

Distributed models are pinned to "xla" by ``parallel.distribute()`` —
the point axis is the sharded axis and this kernel has no
custom_partitioning rule.

MEASURED OUTCOME — REJECTED AS A DEFAULT, and why that is final: the op
is MXU FLOP-BOUND at these shapes, not HBM-bound. XLA's three fusions
(t-producing forward + two VJP contractions) each run at ~85-95% of bf16
MXU peak INCLUDING the 162 MB round-trip (device profile: 110/110/90 us
against an 85 us/dot FLOP floor) — the compiler fully overlaps the HBM
traffic this kernel was built to eliminate, so the recompute-VJP saves
bandwidth the program doesn't need while paying the recompute dot and
K-padding (m=200 -> 256) on top. The kernel's own floor (3 fat dots +
VPU) equals XLA's measured time; no tiling can beat it. "auto" therefore
resolves to "xla"; "pallas" stays as an explicit opt-in (useful where
HBM pressure, not time, binds) and as the recorded bound for this
direction (same protocol as the rejected Pallas triangular solve,
ops/pallas_trisolve.py). Step-level A/B:
experiments/out/quad_pallas_step_ab.json.

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


def _sum_per_channel(t2, e_ref):
    """Per-channel lane-group sum of t2 (tile, m*L) -> (tile, L) via the 0/1
    selector, as THREE 1-pass bf16 MXU dots on a hi/mid/lo split of t2.

    The split recovers ~24 significand bits (8 per bf16 term), so against
    an f32 sum this is accurate to f32's own rounding scale (~2^-24 rel per
    element; E entries are 0/1, exact in bf16, and every partial dot
    accumulates in f32). A single HIGHEST f32 dot here was the v2.0
    kernel's hidden cost — ~6 MXU passes against a 128-padded 10-lane
    output; a 2-term split measured 1.5e-5 rel, failing the "highest"
    numerics bar.
    """
    hi = t2.astype(jnp.bfloat16)
    r1 = t2 - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    e = e_ref[...].astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    d = lambda a: jax.lax.dot_general(
        a, e, dims, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    return d(hi) + (d(mid) + d(lo))


def _fwd_body(prec, x_ref, fcat_ref, e_ref, o_ref):
    x = x_ref[...]  # (tile_n, m)
    # one fat MXU contraction for ALL channels: (tile, m) @ (m, m*L)
    t = _dot_prec(x, fcat_ref[...], (((1,), (0,)), ((), ())), prec)
    o_ref[...] = _sum_per_channel(t * t, e_ref)  # (tile_n, L)


def _bwd_body(L, prec, x_ref, fcat_ref, dy_ref, dx_ref, df_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        df_ref[...] = jnp.zeros_like(df_ref)

    x = x_ref[...]  # (tile_n, m)
    # recompute this tile's t block in VMEM — never reloaded from HBM
    t = _dot_prec(x, fcat_ref[...], (((1,), (0,)), ((), ())), prec)
    # k-major lanes (col = k*L + b) make the dy channel-broadcast a pure
    # VPU tile-repeat — exact and MXU-free (the v2.0 selector dot for this
    # was ~half the kernel's device time)
    w = pltpu.repeat(2.0 * dy_ref[...], t.shape[1] // L, axis=1) * t
    # dx[n, i] = sum_{b,k} w[n, kL+b] F[b, i, k]  — Fcat's own lane axis is
    # exactly that (k, b) pairing, so this is one fat dim1-dim1 dot
    dx_ref[...] = _dot_prec(w, fcat_ref[...], (((1,), (1,)), ((), ())), prec)
    # dFcat[i, kL+b] = sum_n x[n, i] w[n, kL+b]  (accumulated across grid)
    df_ref[...] += _dot_prec(x, w, (((0,), (0,)), ((), ())), prec)


def _pad_points(a: jnp.ndarray, Np: int) -> jnp.ndarray:
    """Zero-pad the second-to-last axis... (G, N, m) -> (G, Np, m)."""
    N = a.shape[1]
    if Np == N:
        return a
    return jnp.pad(a, ((0, 0), (0, Np - N), (0, 0)))


# Budget for the kernel's live (tile, L*m) f32 temporaries against
# Mosaic's 16M scoped-vmem stack (block buffers are pipelined separately);
# halve the point tile until they fit. Forward keeps t + t*t live
# (n_big=2); backward t + dy_exp + w + dot staging (n_big=4); the "high"
# 3-pass decomposition holds two extra partial products (+2). Undersized
# tiles are the measured failure mode — the first cut (4M budget ->
# tile=128 at L*m=2000) ran the backward at ~20% MXU efficiency.
_T_VMEM_BUDGET = 12 * 1024 * 1024
# The temporaries live on Mosaic's scoped-vmem stack, whose DEFAULT limit
# is 16M — measured 140K short at tile=256/L*m=2000 once dot staging and
# block double-buffers are counted. v5e has 128M of VMEM; raise the
# per-kernel cap instead of starving the tile (tile=128 ran at ~20% MXU
# efficiency).
_VMEM_LIMIT = 64 * 1024 * 1024


def _compiler_params(interpret: bool):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT
    )


def _pick_tile(tile_n: int, N: int, Lm: int, n_big: int, prec: str) -> int:
    if prec == "high":
        n_big += 2
    tile = min(tile_n, _round_up(max(N, _SUBLANE), _SUBLANE))
    while tile > _SUBLANE and n_big * tile * Lm * 4 > _T_VMEM_BUDGET:
        tile = max(_SUBLANE, _round_up(tile // 2, _SUBLANE))
    return tile


def _selector(L: int, m: int) -> jnp.ndarray:
    """(m*L, L) 0/1 channel-membership matrix, k-major lanes:
    E[k*L + b, b'] = [b == b']."""
    return jnp.asarray(np.tile(np.eye(L), (m, 1)), jnp.float32)


def _fwd_pallas(x, F, precision: str, tile_n: int, interpret: bool):
    G, N, m = x.shape
    L = F.shape[0]
    tile = _pick_tile(tile_n, N, L * m, n_big=2, prec=precision)
    Np = _round_up(max(N, tile), tile)
    # flatten (G, Np) into one row axis: fatter dots, G*Np//tile grid steps
    xf = _pad_points(x, Np).reshape(G * Np, m)
    # Fcat[i, k*L + b] = F[b, i, k] — all channels as one fat RHS,
    # k-major lanes so the backward's dy broadcast is a pure tile-repeat
    Fcat = jnp.transpose(F, (1, 2, 0)).reshape(m, m * L)
    body = functools.partial(_fwd_body, precision)
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((G * Np, L), jnp.float32),
        grid=(G * Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, L * m), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * m, L), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, L), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xf, Fcat, _selector(L, m))
    # channel-major (G, L, N) for the caller — a ~1 MB XLA transpose
    return jnp.swapaxes(out.reshape(G, Np, L)[:, :N, :], -1, -2)


def _bwd_pallas(x, F, dy, precision: str, tile_n: int, interpret: bool):
    G, N, m = x.shape
    L = F.shape[0]
    tile = _pick_tile(tile_n, N, L * m, n_big=4, prec=precision)
    Np = _round_up(max(N, tile), tile)
    xf = _pad_points(x, Np).reshape(G * Np, m)
    # point-major dy (G*Np, L); padded rows are multiplied by t's zero rows
    dyT = _pad_points(jnp.swapaxes(dy, -1, -2), Np).reshape(G * Np, L)
    Fcat = jnp.transpose(F, (1, 2, 0)).reshape(m, m * L)
    body = functools.partial(_bwd_body, L, precision)
    dx, dFcat = pl.pallas_call(
        body,
        out_shape=(
            jax.ShapeDtypeStruct((G * Np, m), jnp.float32),
            jax.ShapeDtypeStruct((m, L * m), jnp.float32),
        ),
        grid=(G * Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, m), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, L * m), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, L), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, m), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, L * m), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xf, Fcat, dyT)
    # invert Fcat's k-major layout: dF[b, i, k] = dFcat[i, k*L + b]
    dx = dx.reshape(G, Np, m)[:, :N, :]
    return dx, jnp.transpose(dFcat.reshape(m, m, L), (2, 0, 1))


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
