"""Batched small-matrix Cholesky as a single fused Pallas TPU kernel.

Motivation (reference hot sites: /root/reference/gpsa/models/vgpsa.py:255-257,
320,394,410-412): every training step factorizes O(V*D + L) inducing-scale
Gram/covariance matrices. XLA lowers each batched `jnp.linalg.cholesky` to a
generic blocked While-loop program whose per-iteration overhead dominates at
m <= ~256; at the real-data config (m=200, 14 variational covariances) the
factorizations plus their VJP are ~23% of the training step
(experiments/out/step_profile.json attribution note).

Kernel design (see /opt/skills/guides/pallas_guide.md):

* The whole batch slab lives in VMEM and the BATCH axis is vectorized
  INSIDE the kernel — the serial column recurrence is unavoidable
  (Cholesky's critical path), so each serial step must do as much parallel
  work as possible: one step processes that column for EVERY matrix in the
  slab at once. Gridding the batch instead would run matrices
  sequentially (TPU grid steps are serial on a core) and leave the VPU
  ~99% idle.
* Blocked right-looking update: panels of NB=8 columns are eliminated with
  rank-1 VPU steps restricted to the (B, NB, mp) panel, then the trailing
  matrix takes ONE batched MXU update M -= U_panel^T U_panel per block —
  so the O(m^3) work rides the MXU and the serial VPU work is O(m^2 NB).
* Lane-friendly orientation: the working matrix stays symmetric, so the
  pivot "column" is read as a ROW (sublane index, cheap) and the factor is
  produced TRANSPOSED (U = L^T, upper-triangular, row writes only); the
  caller transposes once at the end. Column extraction inside the panel is
  a one-hot lane reduction — no lane->sublane transposes anywhere.
* Matrices are padded to the 128-lane boundary with an identity block
  (block-diag(K, I) factors to block-diag(L, I)), so the in-kernel loops
  run un-masked over the padded size.

NaN semantics match `jnp.linalg.cholesky`: an indefinite pivot produces
rsqrt(<0) = NaN which propagates through the panel and trailing updates,
so the NaN probes in `ops.linalg.jittered_cholesky` behave identically on
this path.

The backward pass is the standard Cholesky pullback (Murray 2016,
"Differentiation of the Cholesky decomposition") expressed with XLA
triangular solves — the same algebra XLA's own cholesky VJP uses — so
gradients agree to f32 tolerance while the forward runs on the fused path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = ["cholesky", "PALLAS_CHOLESKY_MIN_M", "PALLAS_CHOLESKY_MIN_BATCH"]

# Dispatch gates, set from step-level A/Bs (not the micro-benchmark, which
# is dispatch-noise-bound through the tunnel): the m=50 north-star slab
# (14, 50, 50) is where XLA's serial per-iteration overhead dominates —
# forcing this kernel there lifts the scanned train step 1653 -> 1948
# steps/s (+18%), and at m=200 the step-level win is +2.5%
# (experiments/out/pallas_cholesky_step_ab.json). Converged-accuracy parity
# at small m (the jitter-hypersensitive regime) is pinned by
# experiments/out/pallas_cholesky_smallm_ab.json. Below m=48 the 128-lane
# padding wastes >60% of the kernel's work and the XLA factorization is
# already a negligible share of any step this library runs.
PALLAS_CHOLESKY_MIN_M = 48
PALLAS_CHOLESKY_MIN_BATCH = 2

_NB = 8  # panel width: f32 sublane quantum; keeps the serial VPU work small
_MAX_SLAB_BYTES = 6 * 1024 * 1024  # per-buffer VMEM budget for one grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(BC: int, mp: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    n_blocks = mp // _NB

    def kernel(a_ref, out_ref, m_scr, p_scr):
        # a_ref/out_ref: (BC, mp, mp); m_scr: (BC, mp, mp); p_scr: (BC, NB, mp)
        m_scr[:, :, :] = a_ref[:, :, :]
        lane = lax.broadcasted_iota(jnp.int32, (1, mp), 1)  # (1, mp)

        def block_step(b, _):
            j0 = b * _NB
            p_scr[:, :, :] = m_scr[:, pl.ds(j0, _NB), :]
            for t in range(_NB):  # static unroll: NB serial rank-1 steps
                j = j0 + t
                e_j = jnp.where(lane == j, 1.0, 0.0)  # (1, mp) one-hot
                prow = p_scr[:, t, :]  # (BC, mp) — pivot row == pivot column
                piv = jnp.sum(prow * e_j, axis=-1, keepdims=True)  # (BC, 1)
                inv = lax.rsqrt(piv)
                u = prow * inv  # (BC, mp): row j of U = L^T
                out_ref[:, pl.ds(j, 1), :] = jnp.where(
                    lane >= j, u, 0.0
                )[:, None, :]
                # Panel update: P[s, :] -= P[s, j] * row_j / piv, batched.
                colj = jnp.sum(
                    p_scr[:, :, :] * e_j[None], axis=-1, keepdims=True
                )  # (BC, NB, 1): lane-j entry of every panel row
                p_scr[:, :, :] = p_scr[:, :, :] - colj * (u * inv)[:, None, :]
            # Trailing MXU update: M -= U_panel^T U_panel (batched, k=NB).
            u_p = out_ref[:, pl.ds(j0, _NB), :]  # (BC, NB, mp), masked rows
            m_scr[:, :, :] = m_scr[:, :, :] - lax.dot_general(
                u_p,
                u_p,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return 0

        lax.fori_loop(0, n_blocks, block_step, 0)

    return kernel


def _chol_pallas_padded(a_pad: jnp.ndarray) -> jnp.ndarray:
    """a_pad: (B, mp, mp) f32, mp a multiple of 128. Returns U with
    U^T U = a_pad (upper-triangular, rows masked)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, mp, _ = a_pad.shape
    BC = max(1, min(B, _MAX_SLAB_BYTES // (mp * mp * 4)))
    n_chunks = -(-B // BC)
    if B % BC:  # pad batch so the grid divides evenly (identity matrices)
        pad_b = n_chunks * BC - B
        eye = jnp.broadcast_to(jnp.eye(mp, dtype=jnp.float32), (pad_b, mp, mp))
        a_pad = jnp.concatenate([a_pad, eye], axis=0)

    out = pl.pallas_call(
        _make_kernel(BC, mp),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (BC, mp, mp), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (BC, mp, mp), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks * BC, mp, mp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BC, mp, mp), jnp.float32),
            pltpu.VMEM((BC, _NB, mp), jnp.float32),
        ],
    )(a_pad)
    return out[:B]


def _chol_forward(a: jnp.ndarray) -> jnp.ndarray:
    batch_shape = a.shape[:-2]
    m = a.shape[-1]
    mp = _round_up(m, 128)
    B = 1
    for s in batch_shape:
        B *= s
    a2 = a.reshape(B, m, m).astype(jnp.float32)
    if mp != m:
        pad = mp - m
        a2 = jnp.pad(a2, ((0, 0), (0, pad), (0, pad)))
        tail = jnp.pad(jnp.eye(pad, dtype=jnp.float32), ((m, 0), (m, 0)))
        a2 = a2 + tail[None]
    U = _chol_pallas_padded(a2)
    L = jnp.swapaxes(U, -1, -2)[:, :m, :m]
    return L.reshape(*batch_shape, m, m)


# --- SPMD story -------------------------------------------------------------
# pallas_call has no partitioning rule of its own, so without help the SPMD
# partitioner all-gathers any sharded operand around the kernel (the round-3
# reason distribute() pinned sharded-state models back to XLA). Batch lanes
# of a Cholesky are independent, so batch-dim sharding is trivially correct:
# custom_partitioning declares the trailing (matrix) dims replication-only
# and every leading dim passthrough, and each device runs the fused kernel on
# its local slab — no collectives (HLO-asserted in tests/test_sharding.py).
from jax.experimental.custom_partitioning import custom_partitioning


def _batch_sharding(sharding, ndim):
    """The operand/result sharding with the trailing two dims replicated."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = list(sharding.spec[: ndim - 2])
    spec += [None] * max(0, ndim - 2 - len(spec))
    return NamedSharding(sharding.mesh, PartitionSpec(*spec, None, None))


def make_partitioned_cholesky(lower_fn):
    """Wrap a batched-Cholesky impl in the batch-dim partitioning rule.

    ``lower_fn`` runs per shard on its local slab. Factored out so the rule
    itself is testable on the CPU mesh with an XLA stand-in lower_fn
    (interpret-mode pallas carries an ordered-IO callback effect that
    custom_partitioning cannot lower, so the real kernel can only go through
    this path on actual TPU — where it has no such effect)."""

    def _partition(mesh, arg_shapes, result_shape):
        sh = _batch_sharding(arg_shapes[0].sharding, len(arg_shapes[0].shape))
        return mesh, lower_fn, sh, (sh,)

    def _infer_sharding(mesh, arg_shapes, result_shape):
        return _batch_sharding(arg_shapes[0].sharding, len(arg_shapes[0].shape))

    wrapped = custom_partitioning(lower_fn)
    wrapped.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer_sharding,
        # Shardy propagation rule: batch factors pass through, matrix dims
        # must be replicated (each shard needs whole matrices).
        sharding_rule="... i j -> ... i j",
        need_replication_factors=("i", "j"),
    )
    return wrapped


_chol_partitioned = make_partitioned_cholesky(_chol_forward)


# custom_partitioning has no vmap batching rule, but the kernel is
# rank-polymorphic over leading batch dims — so vmap (e.g. fit_multistart's
# vectorized restarts) just folds the mapped axis into the batch.
@jax.custom_batching.custom_vmap
def _chol_batched(a: jnp.ndarray) -> jnp.ndarray:
    return _chol_partitioned(a)


@_chol_batched.def_vmap
def _chol_batched_vmap(axis_size, in_batched, a):
    del axis_size, in_batched  # mapped axis arrives at dim 0 = a batch dim
    return _chol_batched(a), True


@jax.custom_vjp
def cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of a batched PSD matrix via the fused Pallas kernel.

    Semantics match ``jnp.linalg.cholesky`` (including NaN on indefinite
    input). f32 only; arbitrary batch dims. Batch-dim-sharded operands run
    the kernel per shard with no collectives (custom_partitioning above).
    """
    return _chol_batched(a)


def _chol_fwd(a):
    L = _chol_batched(a)
    return L, L


def _trans_solve(L, rhs):
    """L^-T rhs — via the fused Pallas substitution kernel ONLY when the
    deprecated global impl is explicitly 'pallas' (impl=None -> global
    resolution in the shared gate; 'auto' stays on XLA, the measured
    step-level winner — see linalg._trisolve_pallas_ok)."""
    from . import linalg as _lin
    from . import pallas_trisolve as _pt

    m, n = L.shape[-1], rhs.shape[-1]
    batch = 1
    for s in L.shape[:-2]:
        batch *= s
    if _lin._trisolve_pallas_ok(None, m, n, batch, L.dtype):
        return _pt.tri_solve(L, rhs, True)
    return jsl.solve_triangular(jnp.swapaxes(L, -1, -2), rhs, lower=False)


def _chol_bwd(L, Lbar):
    # Murray (2016): with S = L^T Lbar and Phi(X) = tril(X) - diag(X)/2,
    # Abar = (1/2) L^-T (Phi(S) + Phi(S)^T) L^-1, which is symmetric.
    S = jnp.swapaxes(L, -1, -2) @ Lbar
    diag = jnp.diagonal(S, axis1=-2, axis2=-1)  # (..., m)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    P = jnp.tril(S) - 0.5 * eye * diag[..., None, :]
    Psym = P + jnp.swapaxes(P, -1, -2)
    # X = L^-T Psym L^-1 via two triangular solves (fused kernel when gated).
    tmp = _trans_solve(L, Psym)  # L^-T Psym
    X = jnp.swapaxes(_trans_solve(L, jnp.swapaxes(tmp, -1, -2)), -1, -2)
    # X is already symmetric (Psym is); average only to clean fp asymmetry.
    return (0.25 * (X + jnp.swapaxes(X, -1, -2)),)


cholesky.defvjp(_chol_fwd, _chol_bwd)
