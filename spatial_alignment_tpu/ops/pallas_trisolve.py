"""Batched triangular solve / inverse as a single fused Pallas TPU kernel.

STATUS: measured and NOT promoted — explicit opt-in only (impl='pallas').

Motivation (reference hot sites: /root/reference/gpsa/models/vgpsa.py:174-204,
cholesky_solve + the KL's MultivariateNormal solves at :498-530): after the
dispatch-merged factor pass and the Pallas Cholesky, the remaining serial
share of a train step is XLA's triangular_solve lowering — a
``InvertDiagBlocksLowerTriangular`` custom-call (serial within each 128-wide
diagonal block) plus a While-loop of block matmuls. At m <= 128 the WHOLE
solve is that serial inversion: the committed op profiles attribute 37% of
the m=50 north-star step and 13% of the m=200 Visium step to it
(experiments/out/op_profile_visium.json).

MEASURED OUTCOME (experiments/out/pallas_trisolve_step_ab.json, scanned
train-loop A/B, three arms x two configs on the real chip): numerically
exact vs XLA (~2e-7 rel, fwd + VJP + vmap), but 1.00-1.03x at the m=50
north-star (inside the ±8% session noise band) and 0.95-0.96x at the m=200
Visium config — a real step-level REGRESSION, whether dispatched at every
gated site or only at narrow-RHS sites. Root cause: the profile share that
motivated this kernel is not serial overhead XLA wastes — XLA's lowering
already inverts each 128-wide diagonal block ONCE and applies it with fat
MXU block-matmuls, and at m <= 256 there are only 1-2 such blocks; this
kernel's 8-row substitution panels replace those matmuls with a longer
VPU-bound recurrence (m serial rank-1 steps), so it loses exactly where the
RHS is wide enough for XLA's matmuls to pay. The dispatch-count saving
(cho_solve's two substitutions fused to two pallas_calls, tri_inverse's
identity never leaving HBM) does not cover that at any measured config.
Kept as an explicit opt-in for latency-dominated shapes; 'auto' stays XLA
(ops/linalg.py:_trisolve_pallas_ok).

Kernel design mirrors ops/pallas_cholesky.py (see
/opt/skills/guides/pallas_guide.md):

* The whole (B, m, m) factor slab and (B, m, n) RHS live in VMEM and the
  BATCH axis is vectorized INSIDE the kernel: forward substitution's column
  recurrence is the unavoidable critical path, so each serial step processes
  that row for EVERY matrix in the slab (and every RHS lane) at once.
* Blocked substitution: before a panel of NB=8 rows is eliminated, the
  trailing contribution of all already-solved rows is applied as ONE batched
  MXU matmul (L[panel, :past] @ X[:past]); the in-panel recurrence is NB
  rank-1 VPU steps on the (B, NB, n) panel.
* Lane-friendly orientation: L rows map to sublanes, so the pivot entry and
  the panel's pivot column are one-hot LANE reductions — no lane<->sublane
  transposes. The transpose solve (L^T x = b) reuses the same lower-tri
  kernel on the rotated problem J L^T J (J = index reversal), which is lower
  triangular; the reversals are cheap XLA ops outside the kernel.
* Matrices pad to the 128-lane boundary with an identity block and RHS
  columns pad with zeros, so in-kernel loops run un-masked.
* ``tri_inverse`` specializes the RHS to the identity (materialized as
  one-hot rows inside the kernel): no identity matrix ever leaves HBM.

Numerics: plain f32 forward substitution with f32 MXU accumulation — the
same backward-stable algorithm as XLA's lowering (which additionally
*inverts* each 128-wide diagonal block and applies it by matmul, so this
kernel's per-row division is, if anything, the more conservative of the
two). inf/NaN from zero/NaN pivots propagate like XLA's.

The custom VJP is the standard triangular-solve pullback (for X = L^-1 B:
Bbar = L^-T Xbar, Lbar = -tril(Bbar X^T)) whose trans-solve re-enters this
kernel, so the backward pass rides the fused path too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "tri_solve",
    "tri_inverse",
    "PALLAS_TRISOLVE_MIN_M",
    "PALLAS_TRISOLVE_MIN_BATCH",
]

# Dispatch gates (m-gate mirrors pallas_cholesky's, set from step-level
# A/Bs): below m=48 the 128-lane padding wastes most of the kernel's work.
# MIN_BATCH is 1 (not the Cholesky's 2) because the hot solves trace inside
# vmap (the warp layer's per-view map), where the mapped axis is invisible
# to the gate but IS folded into the kernel's physical batch by the
# custom_vmap wrapper — gating on the trace-time batch would reject exactly
# the solves the kernel was built for. An honestly-unbatched solve is still
# latency-bound serial work in XLA's lowering, so the kernel is no worse.
PALLAS_TRISOLVE_MIN_M = 48
PALLAS_TRISOLVE_MIN_BATCH = 1

_NB = 8  # panel height: f32 sublane quantum
_MAX_SLAB_BYTES = 10 * 1024 * 1024  # total VMEM budget for one grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(BC: int, mp: int, np_: int, identity_rhs: bool):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    n_blocks = mp // _NB

    def body(l_ref, b_ref, x_ref, p_scr):
        # l_ref: (BC, mp, mp); b_ref: (BC, mp, np_) or None; x_ref: same;
        # p_scr: (BC, NB, np_).
        lane_m = lax.broadcasted_iota(jnp.int32, (1, mp), 1)  # (1, mp)
        if identity_rhs:
            lane_n = lax.broadcasted_iota(jnp.int32, (1, np_), 1)  # (1, np_)
        x_ref[:, :, :] = jnp.zeros((BC, mp, np_), jnp.float32)

        def block_step(b, _):
            j0 = b * _NB
            Lrow = l_ref[:, pl.ds(j0, _NB), :]  # (BC, NB, mp)
            # Trailing update: acc = B_panel - L[panel, :j0] @ X  (MXU).
            # X rows >= j0 are still zero, but mask L anyway so a NaN pivot
            # from an earlier CORRUPT write can't leak forward out of order.
            Lpast = jnp.where(lane_m[None] < j0, Lrow, 0.0)
            if identity_rhs:
                row_ids = j0 + lax.broadcasted_iota(jnp.int32, (_NB, 1), 0)
                eye_panel = jnp.where(lane_n == row_ids, 1.0, 0.0)  # (NB, np_)
                b_panel = jnp.broadcast_to(eye_panel[None], (BC, _NB, np_))
            else:
                b_panel = b_ref[:, pl.ds(j0, _NB), :]
            # HIGHEST: f32 MXU passes — the substitution's backward stability
            # is the whole point; bf16 trailing updates cost ~1e-3 rel error.
            p_scr[:, :, :] = b_panel - lax.dot_general(
                Lpast,
                x_ref[:, :, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            for t in range(_NB):  # static unroll: NB serial rank-1 steps
                j = j0 + t
                e_j = jnp.where(lane_m == j, 1.0, 0.0)  # (1, mp) one-hot
                ljj = jnp.sum(
                    Lrow[:, t, :] * e_j, axis=-1, keepdims=True
                )  # (BC, 1)
                xj = p_scr[:, t, :] / ljj  # (BC, np_)
                x_ref[:, pl.ds(j, 1), :] = xj[:, None, :]
                # colj = L[panel_rows, j]: lane-j entry of every panel row.
                colj = jnp.sum(
                    Lrow * e_j[None], axis=-1, keepdims=True
                )  # (BC, NB, 1)
                # Rows s < t were consumed already; the extra subtraction on
                # them is dead. Rows s > t receive the substitution update.
                p_scr[:, :, :] = p_scr[:, :, :] - colj * xj[:, None, :]
            return 0

        lax.fori_loop(0, n_blocks, block_step, 0)

    if identity_rhs:

        def kernel(l_ref, x_ref, p_scr):
            body(l_ref, None, x_ref, p_scr)

    else:

        def kernel(l_ref, b_ref, x_ref, p_scr):
            body(l_ref, b_ref, x_ref, p_scr)

    return kernel


def _solve_padded(l_pad: jnp.ndarray, b_pad) -> jnp.ndarray:
    """l_pad: (B, mp, mp) f32 lower-tri (identity on the padded block);
    b_pad: (B, mp, np_) f32 or None (identity RHS, np_ == mp).
    Returns X with l_pad @ X = b_pad."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, mp, _ = l_pad.shape
    identity_rhs = b_pad is None
    np_ = mp if identity_rhs else b_pad.shape[-1]
    per_mat = 4 * (mp * mp + (0 if identity_rhs else mp * np_) + mp * np_)
    BC = max(1, min(B, _MAX_SLAB_BYTES // max(per_mat, 1)))
    n_chunks = -(-B // BC)
    if B % BC:  # pad batch so the grid divides evenly
        pad_b = n_chunks * BC - B
        eye = jnp.broadcast_to(jnp.eye(mp, dtype=jnp.float32), (pad_b, mp, mp))
        l_pad = jnp.concatenate([l_pad, eye], axis=0)
        if not identity_rhs:
            b_pad = jnp.concatenate(
                [b_pad, jnp.zeros((pad_b, mp, np_), jnp.float32)], axis=0
            )

    in_specs = [
        pl.BlockSpec((BC, mp, mp), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
    ]
    operands = [l_pad]
    if not identity_rhs:
        in_specs.append(
            pl.BlockSpec(
                (BC, mp, np_), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(b_pad)
    out = pl.pallas_call(
        _make_kernel(BC, mp, np_, identity_rhs),
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BC, mp, np_), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks * BC, mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BC, _NB, np_), jnp.float32)],
    )(*operands)
    return out[:B]


def _pad_mats(L: jnp.ndarray, rhs, m: int, mp: int, np_: int):
    """Pad the flattened (B, m, m) factor with an identity block and the
    (B, m, n) RHS with zeros to the 128-lane grid."""
    if mp != m:
        pad = mp - m
        L = jnp.pad(L, ((0, 0), (0, pad), (0, pad)))
        tail = jnp.pad(jnp.eye(pad, dtype=jnp.float32), ((m, 0), (m, 0)))
        L = L + tail[None]
    if rhs is not None:
        n = rhs.shape[-1]
        rhs = jnp.pad(rhs, ((0, 0), (0, mp - m), (0, np_ - n)))
    return L, rhs


def _solve_forward(L: jnp.ndarray, rhs, trans: bool, identity_rhs: bool):
    """Flatten batch dims, pad, run the kernel, unpad. ``rhs`` is None when
    identity_rhs (tri_inverse)."""
    batch_shape = L.shape[:-2]
    m = L.shape[-1]
    n = m if identity_rhs else rhs.shape[-1]
    mp = _round_up(m, 128)
    np_ = mp if identity_rhs else _round_up(n, 128)
    B = 1
    for s in batch_shape:
        B *= s
    L2 = L.reshape(B, m, m).astype(jnp.float32)
    r2 = None if identity_rhs else rhs.reshape(B, m, n).astype(jnp.float32)
    if trans:
        # L^T x = b  <=>  (J L^T J)(J x) = J b with J = reversal; J L^T J =
        # (J L J)^T is lower triangular, so rotate+transpose, solve lower,
        # rotate back.
        L2 = jnp.swapaxes(L2, -1, -2)[:, ::-1, ::-1]
        if identity_rhs:
            # (L^T)^-1 = J (J L^T J)^-1 J
            X = _solve_padded(*_pad_mats(L2, None, m, mp, np_))
            X = X[:, :m, :m][:, ::-1, ::-1]
            return X.reshape(*batch_shape, m, m)
        r2 = r2[:, ::-1, :]
    L2, r2 = _pad_mats(L2, r2, m, mp, np_)
    X = _solve_padded(L2, r2)
    X = X[:, :m, :n]
    if trans:
        X = X[:, ::-1, :]
    return X.reshape(*batch_shape, m, n)


# --- SPMD story: batch-dim partitioning via custom_partitioning ------------
# (same rationale as ops/pallas_cholesky.py: pallas_call has no partitioning
# rule, and batch lanes of a triangular solve are independent, so batch-dim
# sharding runs the kernel per shard with no collectives).
from jax.experimental.custom_partitioning import custom_partitioning


def _batch_sharding(sharding, ndim):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = list(sharding.spec[: ndim - 2])
    spec += [None] * max(0, ndim - 2 - len(spec))
    return NamedSharding(sharding.mesh, PartitionSpec(*spec, None, None))


def _make_partitioned(lower_fn, n_args: int, sharding_rule: str, factors):
    def _partition(mesh, arg_shapes, result_shape):
        src = arg_shapes[0]
        sh = _batch_sharding(src.sharding, len(src.shape))
        arg_shs = tuple(
            _batch_sharding(a.sharding, len(a.shape)) for a in arg_shapes
        )
        return mesh, lower_fn, sh, arg_shs

    def _infer_sharding(mesh, arg_shapes, result_shape):
        return _batch_sharding(arg_shapes[0].sharding, len(arg_shapes[0].shape))

    wrapped = custom_partitioning(lower_fn)
    wrapped.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer_sharding,
        sharding_rule=sharding_rule,
        need_replication_factors=factors,
    )
    return wrapped


def _lower_solve(L, rhs):
    return _solve_forward(L, rhs, trans=False, identity_rhs=False)


def _lower_solve_t(L, rhs):
    return _solve_forward(L, rhs, trans=True, identity_rhs=False)


def _lower_inv(L):
    return _solve_forward(L, None, trans=False, identity_rhs=True)


_solve_part = _make_partitioned(
    _lower_solve, 2, "... i j, ... i k -> ... i k", ("i", "j", "k")
)
_solve_t_part = _make_partitioned(
    _lower_solve_t, 2, "... i j, ... i k -> ... i k", ("i", "j", "k")
)
_inv_part = _make_partitioned(_lower_inv, 1, "... i j -> ... i j", ("i", "j"))


# custom_partitioning has no vmap rule; the kernels are rank-polymorphic over
# leading batch dims, so fold mapped axes into the batch (both operands share
# identical batch dims by construction — linalg.tri_solve broadcasts first).
@jax.custom_batching.custom_vmap
def _solve_batched(L, rhs):
    return _solve_part(L, rhs)


@_solve_batched.def_vmap
def _solve_batched_vmap(axis_size, in_batched, L, rhs):
    Lb, rb = in_batched
    if not Lb:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs[None], (axis_size,) + rhs.shape)
    return _solve_batched(L, rhs), True


@jax.custom_batching.custom_vmap
def _solve_t_batched(L, rhs):
    return _solve_t_part(L, rhs)


@_solve_t_batched.def_vmap
def _solve_t_batched_vmap(axis_size, in_batched, L, rhs):
    Lb, rb = in_batched
    if not Lb:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs[None], (axis_size,) + rhs.shape)
    return _solve_t_batched(L, rhs), True


@jax.custom_batching.custom_vmap
def _inv_batched(L):
    return _inv_part(L)


@_inv_batched.def_vmap
def _inv_batched_vmap(axis_size, in_batched, L):
    del axis_size, in_batched
    return _inv_batched(L), True


def _tril_grad(M: jnp.ndarray) -> jnp.ndarray:
    # The forward reads only the lower triangle of L; gradients live there.
    return jnp.tril(M)


def _mm_hi(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # f32 MXU passes: the pullback matmul inherits the caller's matmul
    # precision by default, and at bf16 it alone costs ~2e-3 relative
    # gradient error (measured vs an f64 oracle) — XLA's own solve VJP pins
    # full precision, so match it.
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def tri_solve(L: jnp.ndarray, rhs: jnp.ndarray, trans: bool = False):
    """Solve L x = rhs (or L^T x = rhs when ``trans``) with L lower
    triangular, via the fused batched Pallas kernel.

    Semantics match ``jax.scipy.linalg.solve_triangular(..., lower=True)``
    including inf/NaN propagation from zero/NaN pivots. f32 only; arbitrary
    (matching) batch dims — callers broadcast first. Batch-dim-sharded
    operands run per shard with no collectives.
    """
    if trans:
        return _solve_t_batched(L, rhs)
    return _solve_batched(L, rhs)


def _tri_solve_fwd(L, rhs, trans):
    X = tri_solve(L, rhs, trans)
    return X, (L, X)


def _tri_solve_bwd(trans, res, Xbar):
    L, X = res
    if trans:
        # X = L^-T B: Bbar = L^-1 Xbar; Lbar = -tril(X Bbar^T)
        Bbar = tri_solve(L, Xbar, False)
        Lbar = -_tril_grad(_mm_hi(X, jnp.swapaxes(Bbar, -1, -2)))
    else:
        # X = L^-1 B: Bbar = L^-T Xbar; Lbar = -tril(Bbar X^T)
        Bbar = tri_solve(L, Xbar, True)
        Lbar = -_tril_grad(_mm_hi(Bbar, jnp.swapaxes(X, -1, -2)))
    return Lbar, Bbar


tri_solve.defvjp(_tri_solve_fwd, _tri_solve_bwd)


@jax.custom_vjp
def tri_inverse(L: jnp.ndarray) -> jnp.ndarray:
    """Explicit L^-1 for a batched lower-triangular factor via the fused
    kernel with an in-kernel identity RHS (no identity leaves HBM).

    The backward is the backward-stable solve-based pullback (one fused
    trans-solve + one matmul) — NOT the matmul-only -X^T G X^T form, which
    was measured to degrade converged alignment ~15x
    (ops/linalg.py:tri_inverse docstring).
    """
    return _inv_batched(L)


def _tri_inv_fwd(L):
    X = _inv_batched(L)
    return X, (L, X)


def _tri_inv_bwd(res, Xbar):
    L, X = res
    # X = L^-1: Lbar = -tril(L^-T Xbar X^T)
    G = tri_solve(L, Xbar, True)
    return (-_tril_grad(_mm_hi(G, jnp.swapaxes(X, -1, -2))),)


tri_inverse.defvjp(_tri_inv_fwd, _tri_inv_bwd)


def fits_vmem(m: int, n: int, identity_rhs: bool = False) -> bool:
    """Whether one matrix's padded working set fits the kernel's VMEM budget
    (the dispatcher falls back to XLA for oversized RHS widths)."""
    mp = _round_up(m, 128)
    np_ = mp if identity_rhs else _round_up(n, 128)
    per_mat = 4 * (mp * mp + (0 if identity_rhs else mp * np_) + mp * np_)
    return per_mat <= _MAX_SLAB_BYTES
