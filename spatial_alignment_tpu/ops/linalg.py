"""Numerically-hardened linear algebra for the SVGP layers.

These are the hot primitives of the model (reference call sites:
/root/reference/gpsa/models/vgpsa.py:255-257,314-331,390-426,491-540):
jittered Cholesky, triangular/Cholesky solves, and whitened Gaussian KL.
Everything is batched-first so vmap/jit produce single fused XLA ops that tile
onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import jax.scipy.linalg as jsl

__all__ = [
    "add_jitter",
    "safe_cholesky",
    "factor_psd_cholesky",
    "joint_factor_cholesky",
    "joint_factor_cholesky_inverse",
    "jittered_cholesky_inverse",
    "cholesky_solve",
    "tri_solve",
    "tri_inverse",
    "kl_mvn_chol",
    "kl_whitened",
    "chol_logdet",
    "set_cholesky_impl",
    "get_cholesky_impl",
]

# Which Cholesky implementation the jittered/PSD factorizations use when the
# caller doesn't thread a per-model choice (ModelSpec.cholesky_impl is the
# first-class switch; this module global is a deprecated process-wide
# override kept for scripts that predate the spec field).
# "auto" (default): the fused batched Pallas kernel (ops.pallas_cholesky) on
# the TPU backend for f32 slabs with m >= PALLAS_CHOLESKY_MIN_M and batch >=
# PALLAS_CHOLESKY_MIN_BATCH (measured +18% on the scanned m=50 north-star
# step, +2.5% at m=200; converged-accuracy parity gated by
# experiments/out/pallas_cholesky_smallm_ab.json), XLA everywhere else.
# "xla"/"pallas" force one implementation. Trace-time switch: flip it BEFORE
# building/jitting a model (compiled functions keep whichever implementation
# they were traced with).
_CHOLESKY_IMPL = "auto"


def set_cholesky_impl(impl: str) -> None:
    """Process-wide Cholesky-impl override: 'auto', 'xla' or 'pallas'
    (trace-time). Deprecated in favor of the per-model
    ``ModelSpec.cholesky_impl`` field; a non-'auto' value set here still wins
    over spec-'auto' models for backward compatibility."""
    global _CHOLESKY_IMPL
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown cholesky impl {impl!r}")
    _CHOLESKY_IMPL = impl


def get_cholesky_impl() -> str:
    return _CHOLESKY_IMPL


def _chol(mat: jnp.ndarray, impl: Optional[str] = None) -> jnp.ndarray:
    # Resolution order: explicit per-call/per-model impl ('xla'/'pallas'),
    # then the deprecated module global, then backend-based 'auto'.
    if impl is None or impl == "auto":
        impl = _CHOLESKY_IMPL
    if impl == "auto":
        # "axon" = the remote-attached TPU platform; same Mosaic lowering.
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    if impl == "pallas" and mat.dtype == jnp.float32:
        from . import pallas_cholesky as _pc

        # NOTE: the m/batch gate reads trace-time shapes. Under a vmapped
        # trace (e.g. fit_multistart's vectorized restarts) the mapped axis
        # is invisible here, so `batch` undercounts the physical slab and the
        # dispatch decision can differ from the equivalent unvmapped shapes
        # (pallas_call then runs via vmap's batching rule rather than the
        # kernel's internal batch vectorization). Perf-only: both paths are
        # numerically the same kernel per matrix.
        batch = 1
        for s in mat.shape[:-2]:
            batch *= s
        if (
            mat.shape[-1] >= _pc.PALLAS_CHOLESKY_MIN_M
            and batch >= _pc.PALLAS_CHOLESKY_MIN_BATCH
        ):
            return _pc.cholesky(mat)
    return jnp.linalg.cholesky(mat)


def add_jitter(mat: jnp.ndarray, jitter: float) -> jnp.ndarray:
    """mat + jitter * I on the trailing two dims (batched)."""
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return mat + jitter * eye


def safe_cholesky(mat: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Lower Cholesky of a (batched) PSD matrix with optional extra jitter.

    float32 Cholesky of small-lengthscale Gram matrices is the main stability
    hazard on TPU (SURVEY.md §7 "hard parts"); callers add the model's
    diagonal_offset before calling, and this hook exists to escalate jitter in
    one place if needed.
    """
    if jitter:
        mat = add_jitter(mat, jitter)
    return jnp.linalg.cholesky(mat)


# f32 unit roundoff; storing an exactly-PSD kernel Gram in f32 perturbs its
# eigenvalues by ~ sqrt(m) * ulp * |K|_2 (measured: -1.2e-6 at m=25 /
# |K|~25, -2.6e-5 at m=200 / |K|~170 — both ~0.15 sqrt(m) ulp |K|).
_ULP_F32 = 1.2e-7
_NOISE_SAFETY = 0.5  # ~3-5x above the measured 0.15 sqrt(m) ulp |K| floor
# The floor is gated on the STATIC factor size m, not on the dynamic norm:
# for a saturated (lengthscale >> spread) Gram the floor/eps ratio is
# variance-independent at ~ _NOISE_SAFETY * 0.012 * m^1.5, so at m = 50 any
# coefficient that still protects m >= 100 (>= 2x margin over the measured
# -1.6e-5 indefiniteness) lands the floor within a factor ~2 of eps — and an
# 8-restart bisection (experiments/out/jitter_bisect_*.json) showed even a
# 1.3-1.9x always-on boost over eps regresses EVERY restart's converged
# de-novo alignment ~4x (best 3.7e-4 -> 1.6e-3; stop_gradient and the probe
# rungs exonerated). The two measured regimes are disjoint in m: m <= 50
# Grams factor at eps (lambda_min >= ~-9e-6 saturated) and demand exactly
# eps for accuracy; m >= 100 Grams cannot factor at eps (storage rounding
# alone) and tolerate the floor (template m=200 runs converge to ~1e-5
# aligned error under it). Gate at 64, between the regimes; static in
# shapes, so nothing discontinuous is traced.
_FLOOR_MIN_M = 64


def jittered_cholesky(
    mat: jnp.ndarray, eps: float, *, impl: Optional[str] = None
) -> jnp.ndarray:
    """Lower Cholesky of mat + jitter * I, jittered at the f32 noise floor.

    The reference adds an absolute 1e-5 jitter (gpsa.py:153) and relies on
    LAPACK's f32 spotrf, which tolerates the near-singular Gram matrices this
    model produces (lengthscale ~ domain size => condition ~1e7). TPU's
    blocked f32 Cholesky NaNs right at that cliff, killing training.

    Three properties are load-bearing, all established by measurement:

    1. **Accuracy-critical (small) Grams must get exactly the reference-scale
       eps.** A round-3 variant that always scaled the jitter by |K|_inf
       regressed converged de-novo alignment ~4x (9.9e-4 vs 2.3e-4 on the
       seed-35 oracle draw): a 25x-larger always-on nugget materially
       softens the warp prior.
    2. **The jitter must be a continuous function of the parameters.** The
       round-2 version probe-selected from a discrete eps/100eps/10000eps
       ladder; when a trajectory moved a Gram's lambda_min across the f32
       cliff, the jitter snapped 100x between adjacent steps,
       (K + jI)^-1 Kuf jumped ~100x along near-null eigendirections, and
       the loss exploded -73k -> +1.7e7 in one step, then NaN'd training
       (experiments/out/cliff_introspect.json).
    3. **Large near-rank-1 Grams genuinely cannot factor at eps.** An f32
       Gram of m points is indefinite by ~ sqrt(m) * ulp * |K|_2 from
       storage rounding alone (-2.6e-5 measured at m=200), so any jitter
       below that floor NaNs regardless of cleverness — which is why the
       old ladder sat permanently on its 100x rung at m=200.

    Properties 1 and 3 conflict for any single always-on floor formula (see
    _FLOOR_MIN_M), but the regimes they describe are disjoint in the STATIC
    factor size m, so the floor applies only at m >= _FLOOR_MIN_M:

    * m < 64 — jitter = eps * max(1, mean diag), exactly the reference-scale
      nugget (property 1; bisection-verified: any boost >= 1.3x regresses
      converged de-novo error ~4x, experiments/out/jitter_bisect_*.json).
      These Grams factor at eps (saturated-m=50 lambda_min >= ~-9e-6), and
      the cliff (property 2) was never observed below m=200, so the single
      probe here escalates straight to 100x when it fires — a
      discontinuity, accepted because the regime makes it unreachable in
      healthy training (round-2's exact design, accuracy-proven over every
      small-m artifact).
    * m >= 64 — jitter = max(eps * max(1, mean diag),
                             0.5 * sqrt(m) * ulp * max_row_sum(|K|)).
      The second term is the f32 PSD-rounding noise floor (max |row sum|
      upper-bounds |K|_2); it is a smooth function of the matrix, so the
      jitter never jumps between optimization steps (property 2). m=200
      lengthscale~domain Grams get ~5e-5..2e-4 — a 3-5x margin over their
      measured indefiniteness (property 3), 20x SHARPER than the old
      ladder rung, and template m=200 runs converge to ~1e-5 aligned error
      under it (10k epochs, no cliff).

    Stop-gradient NaN probes remain as a catastrophe fallback in both
    regimes. Below the gate ONE probe escalates straight to 100x (the
    round-2-proven design: probes never fire there in healthy training —
    the selected jitter is identical whether or not a second rung exists —
    so the second probe factorization would be pure per-step cost). In the
    floor regime TWO probes escalate 10x / 100x: the design margin makes
    them unreachable from f32 rounding of a PSD kernel, and the bounded
    10x first step limits the damage if one ever fires; the extra
    factorization is noise next to the m >= 64 Gram work.
    """
    jitter = _probed_jitter(mat, eps, impl)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return _chol(mat + jitter[..., None, None] * eye, impl)


def _base_jitter(mat: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Per-matrix deterministic jitter: reference-scale eps nugget, plus the
    f32 PSD-rounding noise floor at static size m >= _FLOOR_MIN_M (see
    :func:`jittered_cholesky`). Stop-gradient: the jitter is numerical
    stabilization, not a model quantity; differentiating through it adds
    layout-unstable subgradient noise (measured as a 12% single-element
    gradient divergence between shard_map and single-device layouts)."""
    m = mat.shape[-1]
    diag_mean = jnp.maximum(
        1.0, jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1), axis=-1)
    )
    base = eps * diag_mean
    if m >= _FLOOR_MIN_M:
        row_norm = jnp.max(jnp.sum(jnp.abs(mat), axis=-1), axis=-1)
        base = jnp.maximum(base, _NOISE_SAFETY * np.sqrt(m) * _ULP_F32 * row_norm)
    return jax.lax.stop_gradient(base)


def _probed_jitter(
    mat: jnp.ndarray, eps: float, impl: Optional[str] = None
) -> jnp.ndarray:
    """The NaN-probe-escalated jitter for a (batched) kernel Gram slab.

    One batched probe dispatch covers all rungs: in the floor regime
    (m >= _FLOOR_MIN_M) the base and 10x rungs are stacked along the batch
    axis and factored together — the escalation logic is unchanged from the
    two-dispatch form (the selected jitter is identical per matrix), but a
    batched TPU Cholesky is latency-bound in m, so the stacked probe costs
    the same wall time as one rung."""
    base = _base_jitter(mat, eps)
    m = mat.shape[-1]
    eye = jnp.eye(m, dtype=mat.dtype)
    frozen = jax.lax.stop_gradient(mat)
    if m >= _FLOOR_MIN_M:
        slab = jnp.stack([base, 10.0 * base])  # (2, ...batch)
        probes = _chol(frozen[None] + slab[..., None, None] * eye, impl)
        ok = jnp.logical_not(jnp.any(jnp.isnan(probes), axis=(-2, -1)))
        return jnp.where(ok[0], base, jnp.where(ok[1], 10.0 * base, 100.0 * base))
    L = _chol(frozen + base[..., None, None] * eye, impl)
    ok1 = jnp.logical_not(jnp.any(jnp.isnan(L), axis=(-2, -1)))
    return jnp.where(ok1, base, 100.0 * base)


def _factor_fused_ok(fused: Optional[str], m: int, batch: int, dtype) -> bool:
    """Dispatch gate for the fused Cholesky+inverse kernel
    (ops/pallas_factor.py). 'fused' forces it (within the shape gates);
    'off'/None never dispatches. 'auto' resolves to OFF: the step-level
    A/B measured the kernel at 0.970x at the m=200 real-data config and
    1.009x (noise) at the north-star (experiments/out/
    pallas_factor_step_ab.json) — the slab's HBM round-trip is too small
    to be worth a VPU-bound substitution; mechanism in the module
    docstring."""
    if fused in (None, "off", "auto"):
        return False
    if fused != "fused":
        raise ValueError(
            f"fused_factor_inverse must be 'auto', 'fused' or 'off', got {fused!r}"
        )
    if dtype != jnp.float32:
        return False
    from . import pallas_factor as _pf

    return (
        m >= _pf.PALLAS_FACTOR_MIN_M and batch >= _pf.PALLAS_FACTOR_MIN_BATCH
    )


def jittered_cholesky_inverse(
    mat: jnp.ndarray,
    eps: float,
    *,
    impl: Optional[str] = None,
    fused: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`jittered_cholesky` plus the explicit factor inverse L^-1.

    When the fused gate passes (see :func:`_factor_fused_ok`) both come out
    of ONE Pallas kernel dispatch (ops/pallas_factor.py) — the factor never
    round-trips to HBM between the factorization and the substitution.
    Otherwise exactly the unfused chain: ``_chol`` + :func:`tri_inverse`
    (bit-identical to what :func:`jittered_cholesky` + a separate
    ``tri_inverse`` call produce today)."""
    jitter = _probed_jitter(mat, eps, impl)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    jittered = mat + jitter[..., None, None] * eye
    batch = 1
    for s in mat.shape[:-2]:
        batch *= s
    if _factor_fused_ok(fused, mat.shape[-1], batch, mat.dtype):
        from . import pallas_factor as _pf

        return _pf.cholesky_and_inverse(jittered)
    L = _chol(jittered, impl)
    return L, tri_inverse(L, impl=impl)


def joint_factor_cholesky_inverse(
    gram: jnp.ndarray,
    psd_sqt: Optional[jnp.ndarray],
    eps: float,
    *,
    impl: Optional[str] = None,
    n_inv: int = 0,
    fused: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """:func:`joint_factor_cholesky` plus explicit inverses of the first
    ``n_inv`` (gram-lane) factors.

    Returns (L_gram, L_psd | None, inv | None). With ``n_inv`` and the
    fused gate passing, the whole slab factors AND inverts in one Pallas
    dispatch (the kernel inverts every lane — batched triangular work is
    latency-bound, so the unused-psd-lane inverses cost dead MXU flops,
    not wall time — and the gram prefix is sliced out). The unfused
    fallback runs the same ``tri_inverse(L[:n_inv])`` dispatch
    :func:`~spatial_alignment_tpu.models.core` ran before this existed —
    bit-identical per matrix."""
    jitter = _probed_jitter(gram, eps, impl)
    m = gram.shape[-1]
    eye = jnp.eye(m, dtype=gram.dtype)
    jittered = gram + jitter[..., None, None] * eye
    if psd_sqt is None:
        slab = jittered
    else:
        mat = psd_sqt @ jnp.swapaxes(psd_sqt, -1, -2)
        diag_mean = jnp.maximum(
            1.0, jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1), axis=-1)
        )
        scale = jax.lax.stop_gradient(diag_mean)
        psd_jittered = mat + (eps * scale)[..., None, None] * eye
        slab = jnp.concatenate([jittered, psd_jittered], axis=0)
    if n_inv and _factor_fused_ok(fused, m, slab.shape[0], slab.dtype):
        from . import pallas_factor as _pf

        L, Linv = _pf.cholesky_and_inverse(slab)
        inv = Linv[:n_inv]
    else:
        L = _chol(slab, impl)
        inv = tri_inverse(L[:n_inv], impl=impl) if n_inv else None
    Bg = gram.shape[0]
    if psd_sqt is None:
        return L, None, inv
    return L[:Bg], L[Bg:], inv


def joint_factor_cholesky(
    gram: jnp.ndarray,
    psd_sqt: Optional[jnp.ndarray],
    eps: float,
    *,
    impl: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Factor a Gram slab and a PSD-product slab in ONE final dispatch.

    ``gram`` is a (Bg, m, m) slab of kernel Gram matrices (probed floor
    jitter, exactly :func:`jittered_cholesky` semantics per matrix);
    ``psd_sqt`` is a (Bp, m, m) slab of free square factors A whose products
    A A^T + eps*scale*I need factoring (exactly :func:`factor_psd_cholesky`
    semantics per matrix), or None. Returns (L_gram (Bg, m, m),
    L_psd (Bp, m, m) | None).

    Rationale: a batched TPU Cholesky is a serial panel loop whose wall time
    is nearly independent of the batch size, so the per-step cost scales with
    the number of *dispatches*, not the number of matrices. Stacking every
    same-sized factorization of a train step into one call (plus one stacked
    probe call) replaces ~8 latency-bound dispatches with 2 — numerically
    identical per matrix (batch lanes are independent).
    """
    Lg, Lp, _ = joint_factor_cholesky_inverse(gram, psd_sqt, eps, impl=impl)
    return Lg, Lp


def factor_psd_cholesky(
    sqt: jnp.ndarray, eps: float, *, impl: Optional[str] = None
) -> jnp.ndarray:
    """Lower Cholesky of ``sqt @ sqt^T + jitter * I`` for a free square factor.

    Used for the variational covariances Omega = Omega_sqt Omega_sqt^T + eps I
    (reference: vgpsa.py:206-210). Unlike the learned-inducing-point Gram
    matrices, this product is PSD *by construction*, so the NaN probes in
    :func:`jittered_cholesky` (two extra factorizations per call) are pure
    overhead here and are skipped. f32 rounding can perturb eigenvalues by
    ~m * ulp * mean(diag) ≈ 5e-6 * mean(diag) at m = 200 — strictly inside
    the eps * max(1, mean(diag)) jitter added below, so the single
    factorization cannot NaN for finite inputs. (The variational factors
    stay moderately conditioned in every measured run; only the learned
    kernel Grams ever approach the f32 cliff.)
    """
    mat = sqt @ jnp.swapaxes(sqt, -1, -2)
    diag_mean = jnp.maximum(
        1.0, jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1), axis=-1)
    )
    scale = jax.lax.stop_gradient(diag_mean)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return _chol(mat + (eps * scale)[..., None, None] * eye, impl)


def _broadcast_mats(a: jnp.ndarray, b: jnp.ndarray):
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    return (
        jnp.broadcast_to(a, batch + a.shape[-2:]),
        jnp.broadcast_to(b, batch + b.shape[-2:]),
    )


def _trisolve_pallas_ok(impl: Optional[str], m: int, n: int, batch: int, dtype, identity_rhs: bool = False) -> bool:
    """Whether the fused Pallas substitution kernel should take this solve.

    UNLIKE the Cholesky kernel, 'auto' (the library default) resolves to
    XLA here even on TPU: the step-level A/B (experiments/out/
    pallas_trisolve_step_ab.json, three arms x two configs) measured the
    fused kernel at 1.00-1.03x at the m=50 north-star (noise-band) and
    0.95-0.96x at the m=200 Visium config — a real regression. Mechanism:
    XLA's triangular_solve lowering already rides the MXU (it inverts each
    128-wide diagonal block once, then applies block MATMULS), and at
    m <= 256 there are only 1-2 diagonal blocks, so there is almost no
    serial loop left to fuse away — while this kernel's 8-row substitution
    panels replace those fat matmuls with a longer VPU-bound recurrence.
    The kernel remains numerically exact vs XLA (~2e-7 rel on TPU) and is
    kept as an EXPLICIT opt-in (per-call/spec/global impl='pallas') for
    shapes where dispatch latency dominates.

    Explicit impl -> deprecated global; 'auto' never dispatches. Shape
    gates mirror the Pallas Cholesky's, plus a VMEM-fit check for wide
    RHS. The same vmap caveat as _chol applies: mapped axes are invisible
    here, so `batch` undercounts under vmapped traces (perf-only —
    custom_vmap folds the axis into the kernel batch either way)."""
    if impl is None or impl == "auto":
        impl = _CHOLESKY_IMPL
    if impl != "pallas" or dtype != jnp.float32:
        return False
    from . import pallas_trisolve as _pt

    return (
        m >= _pt.PALLAS_TRISOLVE_MIN_M
        and batch >= _pt.PALLAS_TRISOLVE_MIN_BATCH
        and _pt.fits_vmem(m, n, identity_rhs)
    )


def tri_solve(
    chol: jnp.ndarray,
    rhs: jnp.ndarray,
    *,
    trans: bool = False,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Solve L x = rhs (or L^T x = rhs when trans) with L lower triangular.

    Batched; leading dims of the two args broadcast against each other.
    With an EXPLICIT impl='pallas' (per-call, per-model spec, or global),
    f32 slabs dispatch to the fused batched Pallas substitution kernel
    (ops.pallas_trisolve); the 'auto' default stays on XLA, which measured
    faster at step level (see _trisolve_pallas_ok).
    """
    chol, rhs = _broadcast_mats(chol, rhs)
    batch = 1
    for s in chol.shape[:-2]:
        batch *= s
    if _trisolve_pallas_ok(impl, chol.shape[-1], rhs.shape[-1], batch, chol.dtype):
        from . import pallas_trisolve as _pt

        return _pt.tri_solve(chol, rhs, trans)
    return jsl.solve_triangular(chol, rhs, lower=True, trans=1 if trans else 0)


def tri_inverse(chol: jnp.ndarray, *, impl: Optional[str] = None) -> jnp.ndarray:
    """Explicit inverse of a lower-triangular factor, batched.

    One m-wide triangular solve against I. TPU lowers every triangular-solve
    dispatch to a serial block loop (InvertDiagBlocksLowerTriangular + block
    matmuls) whose diag-block stage costs the same regardless of RHS width,
    so inverting once and applying L^-1 as MXU matmuls beats scattering
    per-use solves (profiled: the m=200 step spends ~24% of device time in
    those block loops, experiments/out/op_profile_visium.json). Error is
    ~cond(L)*eps instead of the backward-stable solve's bound; the
    jittered-Cholesky noise floor keeps cond(L) moderate.

    Differentiation is plain autodiff through the solve (one m-wide
    transpose-solve in the backward). Two "cheaper" variants were measured
    and REJECTED at the m=200 / 10k-epoch convergence A/B
    (experiments/out/solve_mode_convergence_ab.json):

      * a matmul-only custom VJP (L_bar = -X^T G X^T with the inexact f32
        X) degraded converged alignment a further ~15x over the autodiff
        backward — the gradient noise of applying the inexact inverse twice
        compounds over training;
      * one Newton refinement of X (X <- X(2I - LX)) cannot improve the f32
        residual: the refinement matmuls re-round at the same ~cond(L)*eps
        floor they try to remove (measured worse).

    Under an EXPLICIT impl='pallas' this dispatches to the Pallas kernel's
    identity-RHS specialization (no identity matrix leaves HBM); the 'auto'
    default stays on XLA, the measured step-level winner
    (_trisolve_pallas_ok).
    """
    m = chol.shape[-1]
    batch = 1
    for s in chol.shape[:-2]:
        batch *= s
    if _trisolve_pallas_ok(impl, m, m, batch, chol.dtype, identity_rhs=True):
        from . import pallas_trisolve as _pt

        return _pt.tri_inverse(chol)
    eye = jnp.eye(m, dtype=chol.dtype)
    chol_b, eye = _broadcast_mats(chol, eye)
    return jsl.solve_triangular(chol_b, eye, lower=True)


def cholesky_solve(
    chol: jnp.ndarray, rhs: jnp.ndarray, *, impl: Optional[str] = None
) -> jnp.ndarray:
    """Solve A x = rhs given A = L L^T (parity with torch.cholesky_solve).

    Batched; leading dims of the two args broadcast against each other.
    On the (explicit-opt-in) Pallas path this is the two-substitution form
    L^T \\ (L \\ rhs) — same algorithm as cho_solve, fused dispatches.
    """
    chol, rhs = _broadcast_mats(chol, rhs)
    batch = 1
    for s in chol.shape[:-2]:
        batch *= s
    if _trisolve_pallas_ok(impl, chol.shape[-1], rhs.shape[-1], batch, chol.dtype):
        from . import pallas_trisolve as _pt

        return _pt.tri_solve(chol, _pt.tri_solve(chol, rhs, False), True)
    return jsl.cho_solve((chol, True), rhs)


def chol_logdet(chol: jnp.ndarray) -> jnp.ndarray:
    """log|A| from its Cholesky factor: 2 * sum(log |diag L|). Batched.

    The abs admits triangular factors with unconstrained diagonal sign
    (GPflow-style q_sqrt parameters): L L^T is the same PSD matrix either
    way, and |det A| = prod diag(L)^2 regardless of sign. For genuine
    Cholesky outputs (diag > 0) this is a no-op.
    """
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(jnp.abs(diag)), axis=-1)


def kl_whitened(mu_q: jnp.ndarray, chol_q: jnp.ndarray) -> jnp.ndarray:
    """KL( N(mu_q, A A^T) || N(0, I) ) from the factor A, batched.

    The whitened-parameterization KL: with q(u) = N(mu_z + L w, L A A^T L^T)
    and p(u) = N(mu_z, L L^T), KL(q||p) = KL(N(w, A A^T) || N(0, I)) — no
    solve against the prior Cholesky and no prior log-det (both cancel),
    which removes every per-step Kuu-dependent term from the KL:
      0.5 * [ ||A||_F^2 + ||mu||^2 - k - 2 sum log |diag A| ]
    """
    k = mu_q.shape[-1]
    trace_term = jnp.sum(jnp.square(chol_q), axis=(-2, -1))
    quad = jnp.sum(jnp.square(mu_q), axis=-1)
    return 0.5 * (trace_term + quad - k - chol_logdet(chol_q))


def kl_mvn_chol(
    mu_q: jnp.ndarray,
    chol_q: jnp.ndarray,
    mu_p: jnp.ndarray,
    chol_p: jnp.ndarray,
    chol_p_inv: Optional[jnp.ndarray] = None,
    *,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """KL( N(mu_q, Lq Lq^T) || N(mu_p, Lp Lp^T) ), batched over leading dims.

    Closed form evaluated directly from the Cholesky factors (the reference
    builds torch MultivariateNormal objects for this; vgpsa.py:498-530):
      0.5 * [ tr(Sp^-1 Sq) + (mu_p - mu_q)^T Sp^-1 (mu_p - mu_q)
              - k + log|Sp| - log|Sq| ]

    ``chol_p_inv`` (an explicit Lp^-1, e.g. from :func:`tri_inverse` shared
    with the SVGP predictive) turns the triangular solve into one MXU
    matmul — no per-KL block-loop dispatch.
    """
    k = mu_q.shape[-1]
    # One triangular solve for both terms: stack Lq and the mean difference
    # along the RHS columns (same Lp). tr(Sp^-1 Sq) = |Lp^-1 Lq|_F^2 and the
    # quadratic term is |Lp^-1 (mu_p - mu_q)|^2.
    diff = (mu_p - mu_q)[..., :, None]
    batch = jnp.broadcast_shapes(chol_q.shape[:-2], diff.shape[:-2])
    rhs = jnp.concatenate(
        [
            jnp.broadcast_to(chol_q, batch + chol_q.shape[-2:]),
            jnp.broadcast_to(diff, batch + diff.shape[-2:]),
        ],
        axis=-1,
    )
    if chol_p_inv is not None:
        sol = chol_p_inv @ rhs
    else:
        sol = tri_solve(chol_p, rhs, impl=impl)
    trace_term = jnp.sum(jnp.square(sol[..., :k]), axis=(-2, -1))
    quad = jnp.sum(jnp.square(sol[..., k:]), axis=(-2, -1))
    logdet = chol_logdet(chol_p) - chol_logdet(chol_q)
    return 0.5 * (trace_term + quad - k + logdet)
