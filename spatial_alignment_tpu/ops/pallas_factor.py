"""Fused batched Cholesky + triangular inverse as ONE Pallas TPU kernel.

The last unfused linalg chain of the m=200 real-data step (VERDICT r4
item 1; reference hot path: /root/reference/gpsa/models/vgpsa.py:174-204,
314-331): after the dispatch merges, a train step still runs
[stacked Cholesky custom call] -> [tri_inverse = InvertDiagBlocks custom
call + block matmuls] as separate XLA dispatches with layout copies
between them — op_profile_visium.json attributes ~12% of device time to
the Cholesky panels, ~9% to the diag-block inversions, and ~6% to
copy/formatting around them. This kernel factors the whole slab AND
produces the explicit factor inverses in one VMEM pass: the factor U
never round-trips to HBM between the two phases and the dispatch count
of the factor pass drops from 3 (probe + chol + tri_inverse) to 2.

Kernel design (see /opt/skills/guides/pallas_guide.md), composing the two
measured bodies from ops/pallas_cholesky.py and ops/pallas_trisolve.py:

* Phase 1 — blocked right-looking Cholesky, batch axis vectorized inside
  the kernel, NB=8 panels: rank-1 VPU steps on the panel, one batched MXU
  trailing update per block. Produces U = L^T (upper-tri, row writes; the
  symmetric input means the pivot column reads as a row).
* Phase 2 — W = U^-1 by blocked BACKWARD substitution on U's rows, bottom
  panel first: one batched MXU trailing update per block
  (I_panel - U[panel, future] @ W[future]) then NB reversed rank-1 VPU
  steps. The identity RHS is materialized in-kernel as one-hot rows
  (nothing but A enters, and U is still resident in VMEM from phase 1).
  W = U^-1 = (L^-1)^T, so the caller's single transpose yields both
  L and L^-1.
* Matrices pad to the 128-lane boundary with an identity block; all
  in-kernel loops run un-masked over the padded size.

NaN semantics match the XLA chain: an indefinite pivot NaNs U's row and
propagates through both trailing updates into W, so the jitter probes in
ops.linalg compose identically.

The custom VJP composes the two standard pullbacks on the XLA side
(inverse: Lbar -= tril(L^-T Wbar^T applied via one triangular solve);
Cholesky: Murray 2016) — identical algebra to the unfused chain's VJP, so
gradients agree to f32 tolerance while the forward runs fused.

A/B status: MEASURED AND REJECTED AS A DEFAULT (experiments/out/
pallas_factor_step_ab.json, real v5e, scanned train loop, same protocol
as pallas_trisolve_step_ab.py): 1.009x at the m=50 north-star (inside the
noise band) and **0.970x at the m=200/N=4,050 Visium config** — a real
regression, so ``fused_factor_inverse="auto"`` never dispatches this
kernel (ops/linalg.py:_factor_fused_ok) and ``"fused"`` is the explicit
opt-in. Mechanism, same family as the trisolve rejection:

* The HBM round-trip fusion deletes is tiny. The whole (14, 200, 200)
  factor slab is ~2.2 MB in f32 — one round-trip costs ~6 us against the
  ~819 GB/s roof, i.e. ~0.2% of a 2.5 ms step. There is no bandwidth to
  win; the fusion argument that carries the Gram kernel (where the
  intermediate is GBs) does not transfer to m<=256 factor slabs.
* XLA's chain is already MXU-shaped at this size. tri_inverse lowers to
  InvertDiagBlocks (2 blocks at m=200) + fat batched block matmuls; the
  in-kernel phase-2 replacement is ~m/NB = 25 serialized 8-row VPU
  substitution panels per matrix — a longer dependent recurrence than
  the work it replaces, exactly the trisolve mechanism
  (ops/pallas_trisolve.py docstring).
* The saved dispatch (3 -> 2) is below step noise on a step that
  dispatches dozens; the probe dispatch dominates the factor pass's
  launch overhead and is unchanged.

The kernel stays as a complete, tested opt-in (useful if a future config
ever makes the factor slab VMEM-resident across consumers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = [
    "cholesky_and_inverse",
    "PALLAS_FACTOR_MIN_M",
    "PALLAS_FACTOR_MIN_BATCH",
]

# Same m-gate rationale as the component kernels: below m=48 the 128-lane
# padding wastes most of the work and the factor pass is a negligible step
# share. Batch gate 2 = the smallest merged slab this library builds.
PALLAS_FACTOR_MIN_M = 48
PALLAS_FACTOR_MIN_BATCH = 2

_NB = 8  # panel quantum: f32 sublane count
_MAX_SLAB_BYTES = 4 * 1024 * 1024  # per-buffer VMEM budget (5 slab buffers)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(BC: int, mp: int):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    n_blocks = mp // _NB

    def kernel(a_ref, u_ref, w_ref, m_scr, p_scr):
        # a_ref: (BC, mp, mp) symmetric input; u_ref: U = L^T out;
        # w_ref: W = U^-1 out; m_scr: trailing working matrix;
        # p_scr: (BC, NB, mp) panel scratch (shared by both phases).
        m_scr[:, :, :] = a_ref[:, :, :]
        lane = lax.broadcasted_iota(jnp.int32, (1, mp), 1)  # (1, mp)

        # ---- Phase 1: Cholesky (ops/pallas_cholesky.py body) ----
        def chol_block(b, _):
            j0 = b * _NB
            p_scr[:, :, :] = m_scr[:, pl.ds(j0, _NB), :]
            for t in range(_NB):  # static unroll: NB serial rank-1 steps
                j = j0 + t
                e_j = jnp.where(lane == j, 1.0, 0.0)  # (1, mp) one-hot
                prow = p_scr[:, t, :]  # (BC, mp) — pivot row == pivot column
                piv = jnp.sum(prow * e_j, axis=-1, keepdims=True)  # (BC, 1)
                inv = lax.rsqrt(piv)
                u = prow * inv  # (BC, mp): row j of U = L^T
                u_ref[:, pl.ds(j, 1), :] = jnp.where(
                    lane >= j, u, 0.0
                )[:, None, :]
                colj = jnp.sum(
                    p_scr[:, :, :] * e_j[None], axis=-1, keepdims=True
                )  # (BC, NB, 1)
                p_scr[:, :, :] = p_scr[:, :, :] - colj * (u * inv)[:, None, :]
            # Trailing MXU update: M -= U_panel^T U_panel.
            u_p = u_ref[:, pl.ds(j0, _NB), :]
            m_scr[:, :, :] = m_scr[:, :, :] - lax.dot_general(
                u_p,
                u_p,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return 0

        lax.fori_loop(0, n_blocks, chol_block, 0)

        # ---- Phase 2: W = U^-1, backward substitution bottom-up ----
        w_ref[:, :, :] = jnp.zeros((BC, mp, mp), jnp.float32)

        def inv_block(bi, _):
            b = n_blocks - 1 - bi
            j0 = b * _NB
            Urow = u_ref[:, pl.ds(j0, _NB), :]  # (BC, NB, mp)
            # Trailing: acc = I_panel - U[panel, >= j0+NB] @ W[>= j0+NB, :].
            # W rows < j0+NB are still zero, but mask U anyway so a NaN
            # from a CORRUPT earlier write can't leak out of order.
            Ufut = jnp.where(lane[None] >= j0 + _NB, Urow, 0.0)
            row_ids = j0 + lax.broadcasted_iota(jnp.int32, (_NB, 1), 0)
            eye_panel = jnp.where(lane == row_ids, 1.0, 0.0)  # (NB, mp)
            p_scr[:, :, :] = jnp.broadcast_to(
                eye_panel[None], (BC, _NB, mp)
            ) - lax.dot_general(
                Ufut,
                w_ref[:, :, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            for tt in range(_NB):  # static reversed unroll
                t = _NB - 1 - tt
                j = j0 + t
                e_j = jnp.where(lane == j, 1.0, 0.0)  # (1, mp)
                ujj = jnp.sum(
                    Urow[:, t, :] * e_j, axis=-1, keepdims=True
                )  # (BC, 1)
                wj = p_scr[:, t, :] / ujj  # (BC, mp): row j of W
                w_ref[:, pl.ds(j, 1), :] = wj[:, None, :]
                # colj = U[panel_rows, j]: rows above t accumulate; rows
                # >= t were consumed already (dead update, same as the
                # trisolve kernel's).
                colj = jnp.sum(
                    Urow * e_j[None], axis=-1, keepdims=True
                )  # (BC, NB, 1)
                p_scr[:, :, :] = p_scr[:, :, :] - colj * wj[:, None, :]
            return 0

        lax.fori_loop(0, n_blocks, inv_block, 0)

    return kernel


def _fused_padded(a_pad: jnp.ndarray):
    """a_pad: (B, mp, mp) f32, mp a multiple of 128. Returns (U, W) with
    U^T U = a_pad and W = U^-1 (both upper-triangular)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, mp, _ = a_pad.shape
    BC = max(1, min(B, _MAX_SLAB_BYTES // (mp * mp * 4)))
    n_chunks = -(-B // BC)
    if B % BC:  # pad batch so the grid divides evenly (identity matrices)
        pad_b = n_chunks * BC - B
        eye = jnp.broadcast_to(jnp.eye(mp, dtype=jnp.float32), (pad_b, mp, mp))
        a_pad = jnp.concatenate([a_pad, eye], axis=0)

    spec = pl.BlockSpec((BC, mp, mp), lambda c: (c, 0, 0), memory_space=pltpu.VMEM)
    U, W = pl.pallas_call(
        _make_kernel(BC, mp),
        grid=(n_chunks,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * BC, mp, mp), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * BC, mp, mp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BC, mp, mp), jnp.float32),
            pltpu.VMEM((BC, _NB, mp), jnp.float32),
        ],
    )(a_pad)
    return U[:B], W[:B]


def _fused_forward(a: jnp.ndarray):
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
    U, W = _fused_padded(a2)
    L = jnp.swapaxes(U, -1, -2)[:, :m, :m]
    Linv = jnp.swapaxes(W, -1, -2)[:, :m, :m]
    return (
        L.reshape(*batch_shape, m, m),
        Linv.reshape(*batch_shape, m, m),
    )


# --- SPMD story: batch-dim partitioning (rationale: ops/pallas_cholesky.py;
# batch lanes are independent, so each shard runs the kernel locally).
from jax.experimental.custom_partitioning import custom_partitioning


def _batch_sharding(sharding, ndim):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = list(sharding.spec[: ndim - 2])
    spec += [None] * max(0, ndim - 2 - len(spec))
    return NamedSharding(sharding.mesh, PartitionSpec(*spec, None, None))


def make_partitioned_factor(lower_fn):
    """Batch-dim partitioning rule for a (slab) -> (L, Linv) impl. Factored
    out so the rule is CPU-testable with an XLA stand-in (interpret-mode
    pallas carries an ordered-IO effect custom_partitioning can't lower)."""

    def _partition(mesh, arg_shapes, result_shape):
        sh = _batch_sharding(arg_shapes[0].sharding, len(arg_shapes[0].shape))
        return mesh, lower_fn, (sh, sh), (sh,)

    def _infer_sharding(mesh, arg_shapes, result_shape):
        sh = _batch_sharding(arg_shapes[0].sharding, len(arg_shapes[0].shape))
        return (sh, sh)

    wrapped = custom_partitioning(lower_fn)
    wrapped.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer_sharding,
        sharding_rule="... i j -> ... i j, ... i j",
        need_replication_factors=("i", "j"),
    )
    return wrapped


_fused_partitioned = make_partitioned_factor(_fused_forward)


@jax.custom_batching.custom_vmap
def _fused_batched(a: jnp.ndarray):
    return _fused_partitioned(a)


@_fused_batched.def_vmap
def _fused_batched_vmap(axis_size, in_batched, a):
    del axis_size, in_batched  # mapped axis arrives at dim 0 = a batch dim
    return _fused_batched(a), (True, True)


@jax.custom_vjp
def cholesky_and_inverse(a: jnp.ndarray):
    """(L, L^-1) of a batched PSD matrix in one fused Pallas kernel pass.

    Semantics match (jnp.linalg.cholesky(a), tri-inverse of it) including
    NaN propagation from indefinite inputs. f32 only; arbitrary batch dims;
    batch-dim-sharded operands run per shard with no collectives.
    """
    return _fused_batched(a)


def _fused_fwd(a):
    L, Linv = _fused_batched(a)
    return (L, Linv), (L, Linv)


def _trans_solve(L, rhs):
    return jsl.solve_triangular(jnp.swapaxes(L, -1, -2), rhs, lower=False)


def _fused_bwd(res, cots):
    L, Linv = res
    Lbar, Linvbar = cots
    # Inverse pullback, solve-based (ops/linalg.py:tri_inverse's measured
    # choice — the matmul-only -X^T G X^T form degrades converged alignment):
    # for X = L^-1, Lbar += -tril(L^-T Linvbar X^T).
    G = _trans_solve(L, Linvbar)
    Lbar = Lbar - jnp.tril(
        jnp.matmul(
            G, jnp.swapaxes(Linv, -1, -2), precision=jax.lax.Precision.HIGHEST
        )
    )
    # Cholesky pullback (Murray 2016) — identical to pallas_cholesky's.
    S = jnp.swapaxes(L, -1, -2) @ Lbar
    diag = jnp.diagonal(S, axis1=-2, axis2=-1)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    P = jnp.tril(S) - 0.5 * eye * diag[..., None, :]
    Psym = P + jnp.swapaxes(P, -1, -2)
    tmp = _trans_solve(L, Psym)
    X = jnp.swapaxes(_trans_solve(L, jnp.swapaxes(tmp, -1, -2)), -1, -2)
    return (0.25 * (X + jnp.swapaxes(X, -1, -2)),)


cholesky_and_inverse.defvjp(_fused_fwd, _fused_bwd)
