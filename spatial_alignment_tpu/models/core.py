"""Pure-functional GPSA core: warp layer, data layer, ELBO.

This replaces the reference's stateful ``VariationalGPSA.forward``/``loss_fn``
(/root/reference/gpsa/models/vgpsa.py:212-540) with pure functions over a
parameter pytree and a padded batch, designed so one ``jit`` compiles the
entire training step — both GP layers, all S Monte-Carlo samples, the KL terms
and the masked likelihood — into a single fused XLA graph:

  * the reference's per-view Python loop (vgpsa.py:259-351) -> ``jax.vmap``
    over a stacked (n_views, ...) axis; fixed-view passthrough (vgpsa.py:
    262-273) becomes a ``jnp.where`` mask instead of control flow;
  * the reference's per-sample loop (vgpsa.py:346-351) -> one batched
    reparameterized draw with an (S, ...) noise tensor;
  * ragged views/modalities -> static padded shapes with 0/1 masks applied
    inside the likelihood sum (SURVEY.md §7 "hard parts").

All matrix work (Gram construction, Cholesky, triangular solves, the S-batched
Kuf tensor that dominates FLOPs at scale) is batched-first so XLA tiles it
onto the MXU.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.kernels import get_kernel
from ..ops.linalg import (
    cholesky_solve,
    factor_psd_cholesky,
    jittered_cholesky,
    jittered_cholesky_inverse,
    joint_factor_cholesky,
    joint_factor_cholesky_inverse,
    kl_mvn_chol,
    kl_whitened,
    tri_inverse,
    tri_solve,
)
from ..ops.pallas_gram import gram
from .spec import ModelSpec

_LOG_2PI = math.log(2.0 * math.pi)
# Floor for marginal variances before sqrt: a clamp at exactly 0 makes the
# reparameterized-sample gradient inf * 0 = NaN (d sqrt(u)/du -> inf at 0).
_VAR_FLOOR = 1e-10


class WarpAux(NamedTuple):
    """Intermediates from the warp layer needed by the KL term."""

    Kuu_chol: jnp.ndarray  # (V, m_X, m_X)
    Omega_tril: jnp.ndarray  # (V, D, m_X, m_X)
    mu_z: jnp.ndarray  # (V, m_X, D)
    Kuu_inv: Optional[jnp.ndarray] = None  # (V, m_X, m_X) — inverse mode only


class DataAux(NamedTuple):
    """Intermediates from the data layer needed by the KL term / imputation."""

    Kuu_chol: jnp.ndarray  # (m_G, m_G)
    Omega_tril: Dict[str, jnp.ndarray]  # {mod: (L, m_G, m_G)}
    Kuu_inv: Optional[jnp.ndarray] = None  # (m_G, m_G) — inverse mode only


class ForwardResult(NamedTuple):
    G_means: Dict[str, jnp.ndarray]  # {mod: (V, Np, D)}
    G_samples: Dict[str, jnp.ndarray]  # {mod: (S, V, Np, D)}
    F_latent_samples: Dict[str, jnp.ndarray]  # {mod: (S, V, Np, L)}
    F_observed_samples: Dict[str, jnp.ndarray]  # {mod: (S, V, Np, P)}
    warp_aux: WarpAux
    data_aux: DataAux
    F_latent_samples_test: Optional[Dict[str, jnp.ndarray]] = None
    F_observed_samples_test: Optional[Dict[str, jnp.ndarray]] = None


# ---------------------------------------------------------------------------
# SVGP predictive: mean and diagonal variance (parity: vgpsa.py:174-204)
# ---------------------------------------------------------------------------

# Rematerialize the variance-projection intermediate (alpha^T @ Omega_tril,
# shape (..., B, N, m)) when it exceeds this many elements. At the real-data
# config (N=4,050, m=200, S=5, L=10) that tensor is 162 MB and the profiled
# step spends ~21% of device time writing it out in the forward pass and
# re-reading it in the VJP (experiments/out/op_profile_visium.json:
# slice_add_fusion.3 + multiply_reduce_fusion.28). jax.checkpoint keeps the
# forward from storing it — but the step-level A/B at exactly that config
# measured remat at 0.91x (281 -> 256 steps/s): the VJP recompute
# re-materializes the same tensor for its two consumer matmuls, so the
# round-trip is moved, not removed, and the extra O(B m^2 N) recompute
# matmul is pure loss. MEASURED AND REJECTED as a default — disabled here
# (tests force it on via monkeypatch to keep the path correct); truly
# memory-bound cases are served by spec.data_chunk_size, which bounds the
# intermediate at the source.
_REMAT_QUAD_MIN_ELEMS = None  # disabled (int threshold to enable)


def _quad_diag(
    xT: jnp.ndarray, factors: jnp.ndarray, precision: str,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Per-point quadratic-form diagonals sum_k (xT @ factors)^2 -> (..., B, N).

    xT is (..., N, m); factors is (B, m, m) (per-channel covariance factors).
    Models opted into ``quad_diag_impl="pallas"`` dispatch large TPU shapes
    to the fused Pallas kernel + recompute VJP (ops.pallas_quad) — the
    (..., B, N, m) product tensor then never materializes in HBM. The
    default ("auto" -> "xla": the kernel lost its step A/B,
    quad_pallas_step_ab.json) keeps this inline jnp form, whose gradients
    are XLA autodiff (bit-identical to the pre-kernel library).
    """
    from ..ops import pallas_quad

    if pallas_quad.would_dispatch(xT, factors, impl):
        return pallas_quad.quad_diag(xT, factors, precision)
    with jax.default_matmul_precision(precision):
        t = jnp.expand_dims(xT, -3) @ factors  # (..., B, N, m)
    return jnp.sum(jnp.square(t), axis=-1)


def _quad_diag_maybe_remat(
    xT: jnp.ndarray, factors: jnp.ndarray, precision: str,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    from ..ops import pallas_quad

    if pallas_quad.would_dispatch(xT, factors, impl):
        # The fused kernel already recomputes per tile in VMEM — remat on
        # top would only re-run the dispatch machinery.
        return pallas_quad.quad_diag(xT, factors, precision)
    batch = 1
    for s in xT.shape[:-2]:
        batch *= s
    B = factors.shape[-3]
    elems = batch * B * xT.shape[-2] * xT.shape[-1]
    if _REMAT_QUAD_MIN_ELEMS is not None and elems >= _REMAT_QUAD_MIN_ELEMS:
        return jax.checkpoint(
            lambda a, f: _quad_diag(a, f, precision, impl)
        )(xT, factors)
    return _quad_diag(xT, factors, precision, impl)


def svgp_mean_var(
    kff_diag: jnp.ndarray,  # (..., N)
    Kuf: jnp.ndarray,  # (..., m, N)
    Kuu_chol: jnp.ndarray,  # (m, m) or batched
    mu_x: jnp.ndarray,  # (..., N, C)
    mu_z: jnp.ndarray,  # (m, C)
    delta: jnp.ndarray,  # (m, C)
    Omega_tril: jnp.ndarray,  # (B, m, m) — per output-channel covariance factors
    diagonal_offset: float,
    matmul_precision: str = "highest",
    variance_precision: str = "follow",
    whitened: bool = False,
    solve_mode: str = "solve",
    Kuu_inv: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
    quad_impl: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SVGP marginal posterior at the Kuf columns.

    Returns mu_tilde (..., N, C) and Sigma_tilde (..., B, N) where B indexes
    the Omega batch (spatial dims for the warp layer, latent GPs for the data
    layer). Matches the reference's double jitter add (vgpsa.py:191-204).

    ``matmul_precision`` governs only the O(m^2 N) projection matmuls here —
    the Gram construction (cancellation-sensitive) and the Cholesky stay at
    the caller's highest precision. "high" (bf16 3-pass MXU) is measurably
    faster at large N with ~1e-6 relative error on these well-conditioned
    products; "highest" (f32) is the default.

    ``whitened`` switches the meaning of (delta, Omega_tril) to the whitened
    variational state w = L^-1 (u - mu_z): mu = mu_x + B^T delta and the
    covariance projection uses B^T Omega_tril for B = L^-1 Kuf — ONE
    triangular solve instead of cholesky_solve's two, and ``mu_z`` is unused
    (the prior mean cancels). diag(Kfu Kuu^-1 Kuf) = sum(B^T ** 2) comes for
    free from the same B.

    ``solve_mode="inverse"`` applies Kuu^-1 through the explicit triangular
    inverse (one width-m solve, then f32 MXU matmuls) instead of width-N
    triangular solves — the TPU win at N >> m (see ModelSpec.svgp_solve_mode).
    ``solve_mode="mixed"`` splits by sensitivity: the predictive MEAN is
    reassociated as mu_x + Kfu (Kuu^-1 (delta - mu_z)) — one backward-stable
    solve whose RHS is the C output channels instead of the N points — while
    the variance terms (diag quadratic forms, benign to the inverse's
    cond*eps relative error) use the explicit inverse as MXU matmuls. No
    width-N triangular solve runs at all, and alpha^T itself is never
    formed (Linv folds into the m x m channel factors instead), so mixed is
    both faster than "inverse" and mean-exact like "solve".
    ``Kuu_inv`` supplies a precomputed chol(Kuu)^-1 (e.g. from the shared
    :func:`compute_factors` pass) so no solve runs here at all.

    ``variance_precision`` applies only to the products that feed the
    VARIANCE terms (the diag quadratic forms alpha^T Omega / half^T C and the
    solve path's alpha^T L) — the real-data step's FLOP peak, ~27% of m=200
    device time (op_profile_visium.json) — while the predictive mean keeps
    ``matmul_precision``. "follow" inherits ``matmul_precision``
    (bit-identical to the single-knob behavior); "default" is 1-pass bf16.
    A/B: experiments/out/variance_precision_ab.json.
    """
    if variance_precision == "follow":
        variance_precision = matmul_precision
    inverse = solve_mode == "inverse"
    if inverse or (solve_mode == "mixed" and not whitened):
        # (..., m, m) — the step's only block-loop solve, unless shared
        Linv = Kuu_inv if Kuu_inv is not None else tri_inverse(Kuu_chol, impl=impl)
    if whitened:
        if inverse:
            with jax.default_matmul_precision("highest"):
                B_w = Linv @ Kuf  # (..., m, N)
        else:
            B_w = tri_solve(Kuu_chol, Kuf, impl=impl)  # (..., m, N) — the only solve
        alphaT = jnp.swapaxes(B_w, -1, -2)  # (..., N, m)
        aKa = jnp.sum(jnp.square(alphaT), axis=-1)  # (..., N)
        with jax.default_matmul_precision(matmul_precision):
            mu_tilde = mu_x + alphaT @ delta  # (..., N, C)
        aOa = _quad_diag_maybe_remat(
            alphaT, Omega_tril, variance_precision, quad_impl
        )
    elif solve_mode == "mixed":
        with jax.default_matmul_precision("highest"):
            half = Linv @ Kuf  # (..., m, N) = L^-1 Kuf
        # diag(Kfu Kuu^-1 Kuf) = column norms of L^-1 Kuf
        aKa = jnp.sum(jnp.square(half), axis=-2)  # (..., N)
        # Mean via the narrow (width-C) backward-stable solve, then one
        # MXU projection — never touches the explicit inverse.
        v = cholesky_solve(Kuu_chol, delta - mu_z, impl=impl)  # (..., m, C)
        with jax.default_matmul_precision(matmul_precision):
            mu_tilde = mu_x + jnp.swapaxes(Kuf, -1, -2) @ v  # (..., N, C)
        with jax.default_matmul_precision("highest"):
            # alpha^T Omega_L = (L^-1 Kuf)^T (L^-1 Omega_L): fold Linv into
            # the m x m channel factors so alpha^T is never materialized.
            C_om = jnp.expand_dims(Linv, -3) @ Omega_tril  # (..., B, m, m)
        aOa = _quad_diag_maybe_remat(
            jnp.swapaxes(half, -1, -2), C_om, variance_precision, quad_impl
        )
    elif inverse:
        with jax.default_matmul_precision("highest"):
            half = Linv @ Kuf  # (..., m, N) = L^-1 Kuf
            # alpha^T = Kfu Kuu^-1 = (L^-1 Kuf)^T L^-1
            alphaT = jnp.swapaxes(half, -1, -2) @ Linv  # (..., N, m)
        # diag(Kfu Kuu^-1 Kuf) = column norms of L^-1 Kuf — no extra matmul
        # (the solve path needs alpha^T L to recover the same quantity).
        aKa = jnp.sum(jnp.square(half), axis=-2)  # (..., N)
        with jax.default_matmul_precision(matmul_precision):
            mu_tilde = mu_x + alphaT @ (delta - mu_z)  # (..., N, C)
        aOa = _quad_diag_maybe_remat(
            alphaT, Omega_tril, variance_precision, quad_impl
        )
    else:
        # (Flattening the S batch into the RHS width when the factor is
        # shared — one diag-block inversion instead of S — was measured and
        # rejected: the moveaxis transposes on the (S, m, N) tensor cost ~5%
        # of the m=200 step, more than the saved duplicate inversions.)
        alpha = cholesky_solve(Kuu_chol, Kuf, impl=impl)  # (..., m, N)
        alphaT = jnp.swapaxes(alpha, -1, -2)  # (..., N, m)
        with jax.default_matmul_precision(variance_precision):
            # diag(Kfu Kuu^-1 Kuf) via the factored form
            a_t_K = alphaT @ Kuu_chol
            aKa = jnp.sum(jnp.square(a_t_K), axis=-1)  # (..., N)
        with jax.default_matmul_precision(matmul_precision):
            mu_tilde = mu_x + alphaT @ (delta - mu_z)  # (..., N, C)
        # per-channel: alpha^T Omega_tril, batched over B
        aOa = _quad_diag_maybe_remat(
            alphaT, Omega_tril, variance_precision, quad_impl
        )
    sigma = (
        jnp.expand_dims(kff_diag, -2)
        - jnp.expand_dims(aKa, -2)
        + aOa
        + 2.0 * diagonal_offset
    )
    return mu_tilde, sigma


class FactorPass(NamedTuple):
    """Every Cholesky factor a train step needs, from one batched pass.

    A batched TPU Cholesky is a serial panel loop whose wall time is nearly
    independent of the batch size, so the per-step factorization cost scales
    with the number of XLA dispatches, not matrices. ``compute_factors``
    stacks the warp-layer Kuu Grams (active views), the data-layer Kuu Gram,
    and — in square mode — all variational-covariance products into one
    probe dispatch + one final dispatch (two groups when m_X != m_G),
    replacing the ~8 per-site dispatches of the per-layer path. Numerically
    identical per matrix (batch lanes of a Cholesky are independent); the
    merged op's VJP also merges in the backward pass.
    """

    warp_Kuu_chol: jnp.ndarray  # (Va, m_X, m_X) — active views only
    warp_Om_tril: jnp.ndarray  # (Va, D, m_X, m_X)
    data_Kuu_chol: jnp.ndarray  # (m_G, m_G)
    data_Om_tril: Dict[str, jnp.ndarray]  # {mod: (L, m_G, m_G)}
    # Explicit chol(Kuu)^-1, filled in the "kl_inverse"/"inverse" solve
    # modes (one more merged batched dispatch; shared by the KL and — in
    # "inverse" mode — the SVGP predictive).
    warp_Kuu_inv: Optional[jnp.ndarray] = None  # (Va, m_X, m_X)
    data_Kuu_inv: Optional[jnp.ndarray] = None  # (m_G, m_G)


def _active_views(spec: ModelSpec):
    return [v for v in range(spec.n_views) if not spec.fixed_view_mask[v]]


def _take_active(spec: ModelSpec, arr: jnp.ndarray, active) -> jnp.ndarray:
    if len(active) == spec.n_views:
        return arr  # no gather in the all-active graph
    return jnp.take(arr, jnp.asarray(active), axis=0)


def _warp_grams(spec: ModelSpec, hp: dict, active):
    """(Kuu (Va, m_X, m_X), Omega_sqt (Va, D, m_X, m_X)) for active views."""
    kern = get_kernel(spec.kernel_warp)
    Xt = _take_active(spec, hp["Xtilde"], active)
    ls = _take_active(spec, hp["warp_kernel_lengthscales"], active)
    var = _take_active(spec, hp["warp_kernel_variances"], active)
    Kuu = jax.vmap(lambda X, l, v: kern(X, X, l, v))(Xt, ls, var)
    Om_sqt = _take_active(spec, hp["Omega_sqt_G"], active)
    return Kuu, Om_sqt


def _data_gram(spec: ModelSpec, hp: dict) -> jnp.ndarray:
    kern = get_kernel(spec.kernel_data)
    return kern(
        hp["Gtilde"],
        hp["Gtilde"],
        hp["data_kernel_lengthscale"],
        hp["data_kernel_variance"],
    )


def _split_sizes(sizes, slab):
    parts, off = [], 0
    for s in sizes:
        parts.append(slab[off : off + s])
        off += s
    return parts


def _wants_kuu_inverse(spec: ModelSpec) -> bool:
    """Whether this spec's solve mode consumes explicit chol(Kuu)^-1."""
    if spec.svgp_solve_mode not in ("inverse", "kl_inverse", "mixed"):
        return False
    if spec.whitened_variational and spec.svgp_solve_mode in ("kl_inverse", "mixed"):
        # The whitened KL has no prior solve (kl_whitened), and the
        # kl_inverse predictive keeps triangular solves — nothing would
        # consume the inverses, so don't add the dead block-loop dispatch.
        return False
    return True


def _kuu_inverses(spec: ModelSpec, L_w, L_d, Va: int, m_X: int, m_G: int):
    """(warp, data) explicit Kuu-Cholesky inverses for inverse solve mode,
    merged into one batched tri_inverse dispatch when the sizes match.
    The Kuu factors are replicated under distribute(), so the merge is safe
    even when merged_factor_dispatch is cleared (that guard is about the
    model-sharded Omega lanes)."""
    if not _wants_kuu_inverse(spec):
        return None, None
    impl = spec.cholesky_impl
    if m_X == m_G and Va > 0:
        inv = tri_inverse(jnp.concatenate([L_w, L_d[None]], axis=0), impl=impl)
        return inv[:Va], inv[Va]
    inv_w = tri_inverse(L_w, impl=impl) if Va else None
    return inv_w, tri_inverse(L_d, impl=impl)


def compute_factors(spec: ModelSpec, hp: dict) -> FactorPass:
    """One batched factorization pass over all of the step's m x m matrices.

    See :class:`FactorPass`. In triangular/whitened modes the variational
    factors are stored as tril (zero factorizations), so only the Kuu slabs
    merge; in square mode the Omega products join the same final dispatch.

    When ``spec.merged_factor_dispatch`` is False (set by
    ``parallel.distribute`` when the model axis shards the variational
    state), the model-sharded ``Omega_sqt_F`` products are factored in their
    own per-modality dispatches: fusing them into the replicated Gram slab
    makes the SPMD partitioner leak NaN into zero-weight lanes' gradients
    and would force per-step reshard collectives. All other (replicated)
    lanes still merge.
    """
    eps = spec.diagonal_offset
    active = _active_views(spec)
    Va = len(active)
    D = spec.n_spatial_dims
    tril_mode = spec.triangular_variational or spec.whitened_variational

    Kuu_w, Om_w_sqt = _warp_grams(spec, hp, active)
    Kuu_d = _data_gram(spec, hp)
    m_X, m_G = Kuu_w.shape[-1], Kuu_d.shape[-1]
    om_d_list = [hp["Omega_sqt_F"][mod.name] for mod in spec.modalities]
    om_d_sizes = [s.shape[0] for s in om_d_list]
    mod_names = [mod.name for mod in spec.modalities]

    if tril_mode:
        Om_w_tril = jnp.tril(Om_w_sqt)
        Om_d_tril = {n: jnp.tril(s) for n, s in zip(mod_names, om_d_list)}
        if m_X == m_G and Va > 0:
            if _wants_kuu_inverse(spec):
                L, inv = jittered_cholesky_inverse(
                    jnp.concatenate([Kuu_w, Kuu_d[None]], axis=0), eps,
                    impl=spec.cholesky_impl,
                    fused=spec.fused_factor_inverse,
                )
                return FactorPass(
                    L[:Va], Om_w_tril, L[Va], Om_d_tril, inv[:Va], inv[Va]
                )
            L = jittered_cholesky(
                jnp.concatenate([Kuu_w, Kuu_d[None]], axis=0), eps,
                impl=spec.cholesky_impl,
            )
            L_w, L_d = L[:Va], L[Va]
        else:
            L_w = (
                jittered_cholesky(Kuu_w, eps, impl=spec.cholesky_impl)
                if Va
                else Kuu_w
            )
            L_d = jittered_cholesky(Kuu_d, eps, impl=spec.cholesky_impl)
        inv_w, inv_d = _kuu_inverses(spec, L_w, L_d, Va, m_X, m_G)
        return FactorPass(L_w, Om_w_tril, L_d, Om_d_tril, inv_w, inv_d)

    Om_w_flat = Om_w_sqt.reshape(Va * D, m_X, m_X)
    if not spec.merged_factor_dispatch:
        # Keep the model-sharded Omega_sqt_F lanes out of the merged slab.
        Om_d_tril = {
            n: factor_psd_cholesky(s, eps, impl=spec.cholesky_impl)
            for n, s in zip(mod_names, om_d_list)
        }
        if m_X == m_G and Va > 0:
            Lg, Lp = joint_factor_cholesky(
                jnp.concatenate([Kuu_w, Kuu_d[None]], axis=0), Om_w_flat, eps,
                impl=spec.cholesky_impl,
            )
            L_w, L_d = Lg[:Va], Lg[Va]
            Om_w_tril = Lp.reshape(Va, D, m_X, m_X)
        else:
            if Va:
                L_w, Om_w_t = joint_factor_cholesky(
                    Kuu_w, Om_w_flat, eps, impl=spec.cholesky_impl
                )
                Om_w_tril = Om_w_t.reshape(Va, D, m_X, m_X)
            else:
                L_w, Om_w_tril = Kuu_w, Om_w_sqt
            L_d = jittered_cholesky(Kuu_d, eps, impl=spec.cholesky_impl)
        inv_w, inv_d = _kuu_inverses(spec, L_w, L_d, Va, m_X, m_G)
        return FactorPass(L_w, Om_w_tril, L_d, Om_d_tril, inv_w, inv_d)

    Om_d_flat = jnp.concatenate(om_d_list, axis=0)
    if m_X == m_G and Va > 0:
        n_inv = (Va + 1) if _wants_kuu_inverse(spec) else 0
        Lg, Lp, inv = joint_factor_cholesky_inverse(
            jnp.concatenate([Kuu_w, Kuu_d[None]], axis=0),
            jnp.concatenate([Om_w_flat, Om_d_flat], axis=0),
            eps,
            impl=spec.cholesky_impl,
            n_inv=n_inv,
            fused=spec.fused_factor_inverse,
        )
        L_w, L_d = Lg[:Va], Lg[Va]
        Om_w_tril = Lp[: Va * D].reshape(Va, D, m_X, m_X)
        Om_d_parts = _split_sizes(om_d_sizes, Lp[Va * D :])
        if n_inv:
            Om_d_tril = dict(zip(mod_names, Om_d_parts))
            return FactorPass(L_w, Om_w_tril, L_d, Om_d_tril, inv[:Va], inv[Va])
    else:
        if Va:
            L_w, Om_w_t = joint_factor_cholesky(
                Kuu_w, Om_w_flat, eps, impl=spec.cholesky_impl
            )
            Om_w_tril = Om_w_t.reshape(Va, D, m_X, m_X)
        else:
            L_w, Om_w_tril = Kuu_w, Om_w_sqt
        Lg_d, Lp_d = joint_factor_cholesky(
            Kuu_d[None], Om_d_flat, eps, impl=spec.cholesky_impl
        )
        L_d = Lg_d[0]
        Om_d_parts = _split_sizes(om_d_sizes, Lp_d)
    Om_d_tril = dict(zip(mod_names, Om_d_parts))
    inv_w, inv_d = _kuu_inverses(spec, L_w, L_d, Va, m_X, m_G)
    return FactorPass(L_w, Om_w_tril, L_d, Om_d_tril, inv_w, inv_d)


def omega_tril(spec: ModelSpec, Om_sqt: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Cholesky factor of the variational covariance from its stored factor.

    Square mode (reference parity, vgpsa.py:206-210): factorize
    Omega_sqt @ Omega_sqt^T + eps*I. Triangular / whitened modes: the stored
    factor IS the (lower-triangular) Cholesky factor — zero per-step
    factorizations (in whitened mode it factors the whitened covariance).
    """
    if spec.triangular_variational or spec.whitened_variational:
        return jnp.tril(Om_sqt)
    return factor_psd_cholesky(Om_sqt, eps, impl=spec.cholesky_impl)


# ---------------------------------------------------------------------------
# Warp layer
# ---------------------------------------------------------------------------


def _concat_modalities(spec: ModelSpec, batch: Dict[str, Dict[str, jnp.ndarray]]):
    """Stack per-modality padded arrays along the point axis: (V, Ntot, ...)."""
    coords = jnp.concatenate([batch[m]["coords"] for m in spec.modality_names], axis=1)
    mask = jnp.concatenate([batch[m]["mask"] for m in spec.modality_names], axis=1)
    return coords, mask


def _split_modalities(spec: ModelSpec, arr: jnp.ndarray, axis: int):
    """Inverse of _concat_modalities along the given axis (static slices)."""
    sizes = [m.n_padded for m in spec.modalities]
    pieces = {}
    off = 0
    for mod, size in zip(spec.modalities, sizes):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(off, off + size)
        pieces[mod.name] = arr[tuple(idx)]
        off += size
    return pieces


def warp_layer(
    spec: ModelSpec,
    hp: dict,
    X_all: jnp.ndarray,  # (V, Ntot, D) padded observed coords
    key: jax.Array,
    S: int,
    temperature=1.0,
    noise: Optional[jnp.ndarray] = None,
    factors: Optional[Tuple] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, WarpAux]:
    """Per-view warp GP posterior + S reparameterized samples.

    Returns (G_mean (V, Ntot, D), G_samples (S, V, Ntot, D), aux).
    Vectorized replacement for the reference view loop (vgpsa.py:259-351).
    ``noise`` overrides the internal (S, V, Ntot, D) standard-normal draw
    (used by the shard_map executor to keep shards bit-identical to the
    single-device program). ``factors`` supplies the active views'
    (Kuu_chol (Va, m, m), Om_tril (Va, D, m, m)[, Kuu_inv (Va, m, m)]) from
    a shared :func:`compute_factors` pass; None computes them here (same
    math).
    """
    eps = spec.diagonal_offset
    active = _active_views(spec)
    Va = len(active)
    Linv_a = None
    if factors is None and Va:
        Kuu_w, Om_w_sqt = _warp_grams(spec, hp, active)
        if spec.triangular_variational or spec.whitened_variational:
            L_a = jittered_cholesky(Kuu_w, eps, impl=spec.cholesky_impl)
            Om_a = jnp.tril(Om_w_sqt)
        else:
            m_X = Kuu_w.shape[-1]
            L_a, Om_flat = joint_factor_cholesky(
                Kuu_w, Om_w_sqt.reshape(Va * spec.n_spatial_dims, m_X, m_X), eps,
                impl=spec.cholesky_impl,
            )
            Om_a = Om_flat.reshape(Om_w_sqt.shape)
        if spec.svgp_solve_mode in ("inverse", "mixed"):
            Linv_a = tri_inverse(L_a, impl=spec.cholesky_impl)
    elif factors is not None:
        L_a, Om_a = factors[0], factors[1]
        if len(factors) > 2:
            Linv_a = factors[2]
        if spec.svgp_solve_mode in ("inverse", "mixed") and Linv_a is None and Va:
            # The predictive itself needs Linv here; in kl_inverse mode a
            # missing inverse just means the KL falls back to solves.
            Linv_a = tri_inverse(L_a, impl=spec.cholesky_impl)

    def one_view(Xt, Xv, ls, var, slope, intercept, L, Om_tril_v, delta, Linv):
        Kuf = gram(Xt, Xv, ls, var, spec.kernel_warp)  # (m, Ntot); pallas at scale
        mu_x = Xv @ slope + intercept  # (Ntot, D)
        mu_z = Xt @ slope + intercept  # (m, D)
        kff = jnp.exp(var) * jnp.ones(Xv.shape[0], Xv.dtype)  # vgpsa.py:310-312
        mu_t, sig = svgp_mean_var(
            kff, Kuf, L, mu_x, mu_z, delta, Om_tril_v, eps,
            matmul_precision=spec.svgp_matmul_precision,
            variance_precision=spec.svgp_variance_precision,
            quad_impl=spec.quad_diag_impl,
            whitened=spec.whitened_variational,
            solve_mode=spec.svgp_solve_mode,
            Kuu_inv=Linv,
            impl=spec.cholesky_impl,
        )
        return mu_t, sig, mu_z

    if Va == spec.n_views:
        mu_tilde, sigma, mu_z = jax.vmap(one_view)(
            hp["Xtilde"],
            X_all,
            hp["warp_kernel_lengthscales"],
            hp["warp_kernel_variances"],
            hp["mean_slopes"],
            hp["mean_intercepts"],
            L_a,
            Om_a,
            hp["delta_G"],
            Linv_a,
        )
        Kuu_chol, Om_tril, Kuu_inv = L_a, Om_a, Linv_a
    else:
        # Fixed (template) views: every one_view output is discarded — the
        # mean/samples are overwritten with X_all below and the KL rows are
        # masked in kl_divergence — so skip their m^3 Cholesky/solve pipeline
        # entirely and scatter finite fillers (identity factors keep the
        # masked KL finite; 0 * NaN would poison the loss). Static indices:
        # one compiled gather/scatter, no dynamic shapes.
        idx = jnp.asarray(active)
        take = lambda a: jnp.take(a, idx, axis=0)
        V, Ntot, D = X_all.shape
        m = hp["Xtilde"].shape[1]
        dt = X_all.dtype
        eye_m = jnp.eye(m, dtype=dt)
        mu_tilde = jnp.zeros((V, Ntot, D), dt)
        sigma = jnp.ones((V, D, Ntot), dt)
        Kuu_chol = jnp.broadcast_to(eye_m, (V, m, m))
        Om_tril = jnp.broadcast_to(eye_m, hp["Omega_sqt_G"].shape)
        Kuu_inv = (
            jnp.broadcast_to(eye_m, (V, m, m)) if Linv_a is not None else None
        )
        mu_z = jnp.zeros((V, m, D), dt)
        if active:
            mu_a, sig_a, muz_a = jax.vmap(one_view)(
                take(hp["Xtilde"]),
                take(X_all),
                take(hp["warp_kernel_lengthscales"]),
                take(hp["warp_kernel_variances"]),
                take(hp["mean_slopes"]),
                take(hp["mean_intercepts"]),
                L_a,
                Om_a,
                take(hp["delta_G"]),
                Linv_a,
            )
            mu_tilde = mu_tilde.at[idx].set(mu_a)
            sigma = sigma.at[idx].set(sig_a)
            Kuu_chol = Kuu_chol.at[idx].set(L_a)
            Om_tril = Om_tril.at[idx].set(Om_a)
            if Linv_a is not None:
                Kuu_inv = Kuu_inv.at[idx].set(Linv_a)
            mu_z = mu_z.at[idx].set(muz_a)
    # mu_tilde: (V, Ntot, D); sigma: (V, D, Ntot) -> (V, Ntot, D)
    sigma = jnp.swapaxes(sigma, -1, -2)

    if spec.reference_sample_scale:
        # Reference passes the variance straight to Normal(scale=...)
        # (vgpsa.py:334-340); opt-in for strict behavioral parity.
        scale = sigma
    else:
        scale = jnp.sqrt(jnp.maximum(sigma, _VAR_FLOOR))
    # Optional warp-noise tempering (annealing heuristic; 1.0 = exact ELBO).
    # The reference's sample-scale bug effectively trains with near-zero warp
    # noise, which tightens converged alignment; a decaying temperature gets
    # that benefit without mis-scaled samples.
    scale = scale * temperature

    if noise is None:
        noise = jax.random.normal(key, (S,) + mu_tilde.shape, mu_tilde.dtype)
    samples = mu_tilde[None] + scale[None] * noise  # (S, V, Ntot, D)

    if spec.any_fixed_view:
        fixed = jnp.asarray(spec.fixed_view_mask)[:, None, None]
        mu_tilde = jnp.where(fixed, X_all, mu_tilde)
        samples = jnp.where(fixed[None], X_all[None], samples)

    return mu_tilde, samples, WarpAux(Kuu_chol, Om_tril, mu_z, Kuu_inv)


# ---------------------------------------------------------------------------
# Data layer
# ---------------------------------------------------------------------------


def _pick_chunk(n: int, requested) -> Optional[int]:
    """Largest divisor of n that is <= the requested chunk size (None = no
    chunking, or when n already fits in one chunk)."""
    if requested is None or n <= requested:
        return None
    nc = -(-n // requested)
    while n % nc:
        nc += 1
    return n // nc


def _data_factors(
    spec: ModelSpec, hp: dict
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(Kuu_chol (m_G, m_G), {mod: Om_tril (L, m_G, m_G)}) for the data layer,
    from one probe + one final dispatch (see :class:`FactorPass`)."""
    eps = spec.diagonal_offset
    Kuu_d = _data_gram(spec, hp)
    om_list = [hp["Omega_sqt_F"][mod.name] for mod in spec.modalities]
    names = [mod.name for mod in spec.modalities]
    if spec.triangular_variational or spec.whitened_variational:
        return (
            jittered_cholesky(Kuu_d, eps, impl=spec.cholesky_impl),
            {n: jnp.tril(s) for n, s in zip(names, om_list)},
        )
    if not spec.merged_factor_dispatch:
        # Model-sharded Omega_sqt_F: own dispatches (see compute_factors).
        return (
            jittered_cholesky(Kuu_d, eps, impl=spec.cholesky_impl),
            {
                n: factor_psd_cholesky(s, eps, impl=spec.cholesky_impl)
                for n, s in zip(names, om_list)
            },
        )
    Lg, Lp = joint_factor_cholesky(
        Kuu_d[None], jnp.concatenate(om_list, axis=0), eps,
        impl=spec.cholesky_impl,
    )
    parts = _split_sizes([s.shape[0] for s in om_list], Lp)
    return Lg[0], dict(zip(names, parts))


def data_layer(
    spec: ModelSpec,
    hp: dict,
    G_samples: Dict[str, jnp.ndarray],  # {mod: (S, V, Np, D)}
    key: jax.Array,
    noise: Optional[Dict[str, jnp.ndarray]] = None,  # {mod: (S, V*Np, L)}
    factors: Optional[Tuple] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], DataAux]:
    """Multi-output data GP evaluated at the sampled aligned coordinates.

    Batched over S and (statically) over modalities; replaces vgpsa.py:353-477.
    ``factors`` supplies (Kuu_chol, {mod: Om_tril}) from a shared
    :func:`compute_factors` pass; None computes them here (same math).
    """
    eps = spec.diagonal_offset
    ls = hp["data_kernel_lengthscale"]
    var = hp["data_kernel_variance"]

    if factors is not None:
        L_F, Om_tril_by_mod = factors[0], factors[1]
        Linv_F = factors[2] if len(factors) > 2 else None
    else:
        L_F, Om_tril_by_mod = _data_factors(spec, hp)
        Linv_F = None
    if spec.svgp_solve_mode in ("inverse", "mixed") and Linv_F is None:
        Linv_F = tri_inverse(L_F, impl=spec.cholesky_impl)

    F_latent, F_obs, Om_tril_F = {}, {}, {}
    keys = jax.random.split(key, spec.n_modalities)
    for kk, mod in zip(keys, spec.modalities):
        S, V, Np, D = G_samples[mod.name].shape
        N = V * Np
        G = G_samples[mod.name].reshape(S, N, D)
        Om_tril = Om_tril_by_mod[mod.name]  # (L, m_G, m_G)
        delta = hp["delta_F"][mod.name]  # (m_G, L)
        eps_f = (
            noise[mod.name]
            if noise is not None
            else jax.random.normal(kk, (S, N, mod.n_latent), G.dtype)
        )

        def predict_and_sample(G_pts, eps_pts):
            """SVGP marginal + reparameterized draw at a block of points.

            S-batched cross-Gram — the FLOP peak at scale (vgpsa.py:409
            analog); dispatches to the fused Pallas kernel on TPU for large N.
            """
            Kuf = gram(hp["Gtilde"], G_pts, ls, var, spec.kernel_data)
            kff = jnp.exp(var) * jnp.ones(G_pts.shape[:2], G_pts.dtype)
            mu_t, sig = svgp_mean_var(
                kff, Kuf, L_F, jnp.zeros(()), jnp.zeros(()), delta, Om_tril, eps,
                matmul_precision=spec.svgp_matmul_precision,
                variance_precision=spec.svgp_variance_precision,
                quad_impl=spec.quad_diag_impl,
                whitened=spec.whitened_variational,
                solve_mode=spec.svgp_solve_mode,
                Kuu_inv=Linv_F,
                impl=spec.cholesky_impl,
            )
            return mu_t + jnp.sqrt(
                jnp.maximum(jnp.swapaxes(sig, -1, -2), _VAR_FLOOR)
            ) * eps_pts

        chunk = _pick_chunk(N, spec.data_chunk_size)
        if chunk is None:
            lat = predict_and_sample(G, eps_f)
        else:
            # Chunk the point axis through lax.map: peak memory drops from
            # O(S*L*N*m) (the alpha^T Omega_tril intermediate) to
            # O(S*L*chunk*m), and gradients rematerialize per chunk. The
            # full-tensor noise draw above keeps samples bit-identical to the
            # unchunked path.
            nc = N // chunk
            G_c = jnp.swapaxes(G.reshape(S, nc, chunk, D), 0, 1)
            e_c = jnp.swapaxes(eps_f.reshape(S, nc, chunk, mod.n_latent), 0, 1)
            lat_c = jax.lax.map(lambda ab: predict_and_sample(*ab), (G_c, e_c))
            lat = jnp.swapaxes(lat_c, 0, 1).reshape(S, N, mod.n_latent)

        obs = lat @ hp["W"][mod.name] if mod.use_lmc else lat
        F_latent[mod.name] = lat.reshape(S, V, Np, mod.n_latent)
        F_obs[mod.name] = obs.reshape(S, V, Np, mod.n_outputs)
        Om_tril_F[mod.name] = Om_tril

    return F_latent, F_obs, DataAux(L_F, Om_tril_F, Linv_F)


def data_layer_moments(
    spec: ModelSpec,
    hp: dict,
    G_samples: Dict[str, jnp.ndarray],  # {mod: (S, V, Np, D)}
    factors: Optional[Tuple] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], DataAux]:
    """Per-point observed-output moments of the data GP (no sampling).

    For the Gaussian likelihood the expected log-likelihood has a closed form
    (standard SVGP: E_q[log N(y; f, s)] = log N(y; mu, s) - var/(2 s^2)), so
    the data layer needs no Monte-Carlo draw — only the warp layer does (G
    enters the kernel nonlinearly). Under the LMC, observed moments are
    mu @ W and var @ W^2 (independent latent GPs).

    Returns ({mod: mu_obs (S, V, Np, P)}, {mod: var_obs (S, V, Np, P)}, aux).
    """
    eps = spec.diagonal_offset
    ls = hp["data_kernel_lengthscale"]
    var = hp["data_kernel_variance"]
    if factors is not None:
        L_F, Om_tril_by_mod = factors[0], factors[1]
        Linv_F = factors[2] if len(factors) > 2 else None
    else:
        L_F, Om_tril_by_mod = _data_factors(spec, hp)
        Linv_F = None
    if spec.svgp_solve_mode in ("inverse", "mixed") and Linv_F is None:
        Linv_F = tri_inverse(L_F, impl=spec.cholesky_impl)

    mu_obs, var_obs, Om_tril_F = {}, {}, {}
    for mod in spec.modalities:
        S, V, Np, D = G_samples[mod.name].shape
        N = V * Np
        G = G_samples[mod.name].reshape(S, N, D)
        Om_tril = Om_tril_by_mod[mod.name]
        delta = hp["delta_F"][mod.name]

        def moments(G_pts):
            Kuf = gram(hp["Gtilde"], G_pts, ls, var, spec.kernel_data)
            kff = jnp.exp(var) * jnp.ones(G_pts.shape[:2], G_pts.dtype)
            mu_t, sig = svgp_mean_var(
                kff, Kuf, L_F, jnp.zeros(()), jnp.zeros(()), delta, Om_tril, eps,
                matmul_precision=spec.svgp_matmul_precision,
                variance_precision=spec.svgp_variance_precision,
                quad_impl=spec.quad_diag_impl,
                whitened=spec.whitened_variational,
                solve_mode=spec.svgp_solve_mode,
                Kuu_inv=Linv_F,
                impl=spec.cholesky_impl,
            )
            return mu_t, jnp.maximum(jnp.swapaxes(sig, -1, -2), _VAR_FLOOR)

        chunk = _pick_chunk(N, spec.data_chunk_size)
        if chunk is None:
            mu_t, var_t = moments(G)
        else:
            nc = N // chunk
            G_c = jnp.swapaxes(G.reshape(S, nc, chunk, D), 0, 1)
            mu_c, var_c = jax.lax.map(moments, G_c)
            mu_t = jnp.swapaxes(mu_c, 0, 1).reshape(S, N, mod.n_latent)
            var_t = jnp.swapaxes(var_c, 0, 1).reshape(S, N, mod.n_latent)

        if mod.use_lmc:
            W = hp["W"][mod.name]
            mu_o = mu_t @ W
            var_o = var_t @ jnp.square(W)
        else:
            mu_o, var_o = mu_t, var_t
        mu_obs[mod.name] = mu_o.reshape(S, V, Np, mod.n_outputs)
        var_obs[mod.name] = var_o.reshape(S, V, Np, mod.n_outputs)
        Om_tril_F[mod.name] = Om_tril

    return mu_obs, var_obs, DataAux(L_F, Om_tril_F, Linv_F)


def impute_at(
    spec: ModelSpec,
    hp: dict,
    data_aux: DataAux,
    G_test: Dict[str, jnp.ndarray],  # {mod: (n_test, D)}
    key: jax.Array,
    S: int,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Impute outputs at caller-chosen aligned coordinates (vgpsa.py:438-477).

    Used for common-coordinate reconstruction (e.g. a dense 3-D grid,
    st_alignment_3d_round2.py:250-301). Returns S samples per test point
    (the reference effectively returns one; S here is a strict superset —
    downstream ``.mean(axis=0)`` works identically).
    """
    kern = get_kernel(spec.kernel_data)
    eps = spec.diagonal_offset
    ls = hp["data_kernel_lengthscale"]
    var = hp["data_kernel_variance"]

    F_latent_t, F_obs_t = {}, {}
    keys = jax.random.split(key, spec.n_modalities)
    for kk, mod in zip(keys, spec.modalities):
        Gt = jnp.asarray(G_test[mod.name])
        if Gt.ndim == 3:  # accept the reference's (1, n_test, D) convention
            Gt = Gt[0]
        Kuf = kern(hp["Gtilde"], Gt, ls, var)  # (m_G, n_test)
        kff = jnp.exp(var) * jnp.ones(Gt.shape[0], Gt.dtype)
        delta = hp["delta_F"][mod.name]
        mu_t, sig = svgp_mean_var(
            kff,
            Kuf,
            data_aux.Kuu_chol,
            jnp.zeros(()),
            jnp.zeros(()),
            delta,
            data_aux.Omega_tril[mod.name],
            eps,
            matmul_precision=spec.svgp_matmul_precision,
            variance_precision=spec.svgp_variance_precision,
            quad_impl=spec.quad_diag_impl,
            whitened=spec.whitened_variational,
            solve_mode=spec.svgp_solve_mode,
            Kuu_inv=data_aux.Kuu_inv,
        )
        # mu_t: (n_test, L); sig: (L, n_test)
        noise = jax.random.normal(kk, (S,) + mu_t.shape, mu_t.dtype)
        lat = mu_t[None] + jnp.sqrt(jnp.maximum(jnp.swapaxes(sig, -1, -2), _VAR_FLOOR))[None] * noise
        obs = lat @ hp["W"][mod.name] if mod.use_lmc else lat
        F_latent_t[mod.name] = lat
        F_obs_t[mod.name] = obs
    return F_latent_t, F_obs_t


# ---------------------------------------------------------------------------
# Forward + ELBO
# ---------------------------------------------------------------------------


def forward(
    spec: ModelSpec,
    hp: dict,
    batch: Dict[str, Dict[str, jnp.ndarray]],
    key: jax.Array,
    S: int = 1,
    G_test: Optional[Dict[str, jnp.ndarray]] = None,
    temperature=1.0,
) -> ForwardResult:
    """Full two-layer forward pass (parity: vgpsa.py:212-489).

    Runs under matmul precision "highest": on TPU the default bf16 MXU passes
    lose ~1e-2 relative accuracy, which destroys the PSD-ness of the jittered
    (1e-5) Gram matrices and NaNs the Cholesky. The model's matrices are small
    (m ~ 25-200), so full-f32 MXU passes cost nothing measurable.
    """
    with jax.default_matmul_precision("highest"):
        k_warp, k_data, k_test = jax.random.split(key, 3)
        X_all, _ = _concat_modalities(spec, batch)
        fp = compute_factors(spec, hp)
        G_mean_all, G_sample_all, warp_aux = warp_layer(
            spec, hp, X_all, k_warp, S, temperature,
            factors=(fp.warp_Kuu_chol, fp.warp_Om_tril, fp.warp_Kuu_inv),
        )
        G_means = _split_modalities(spec, G_mean_all, axis=1)
        G_samples = _split_modalities(spec, G_sample_all, axis=2)
        F_latent, F_obs, data_aux = data_layer(
            spec, hp, G_samples, k_data,
            factors=(fp.data_Kuu_chol, fp.data_Om_tril, fp.data_Kuu_inv),
        )

        F_latent_t = F_obs_t = None
        if G_test is not None:
            F_latent_t, F_obs_t = impute_at(spec, hp, data_aux, G_test, k_test, S)

    return ForwardResult(
        G_means, G_samples, F_latent, F_obs, warp_aux, data_aux, F_latent_t, F_obs_t
    )


def gaussian_loglik_sum(
    y: jnp.ndarray, f: jnp.ndarray, scale: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked sum of Normal(f, scale).log_prob(y); f is (S, ...), y (...)."""
    log_prob = (
        -0.5 * jnp.square((y[None] - f) / scale)
        - jnp.log(scale)
        - 0.5 * _LOG_2PI
    )
    return jnp.sum(log_prob * mask[None, ..., None])


def kl_divergence(
    spec: ModelSpec, hp: dict, warp_aux: WarpAux, data_aux: DataAux
) -> jnp.ndarray:
    """Total KL over warp and data variational posteriors (vgpsa.py:498-530).

    Whitened mode: KL(q(w) || N(0, I)) per channel — the prior Cholesky and
    its log-det cancel, so no per-step Kuu-dependent term survives in the KL
    (``kl_whitened``). The two parameterizations express the same KL value
    for corresponding q distributions.
    """
    mu_q = jnp.swapaxes(hp["delta_G"], -1, -2)  # (V, D, m)
    not_fixed = 1.0 - jnp.asarray(spec.fixed_view_mask, mu_q.dtype)
    if spec.whitened_variational:
        kl_G = kl_whitened(mu_q, warp_aux.Omega_tril)  # (V, D)
        KL = jnp.sum(kl_G * not_fixed[:, None])
        for mod in spec.modalities:
            delta = hp["delta_F"][mod.name]  # (m_G, L)
            KL = KL + jnp.sum(
                kl_whitened(
                    jnp.swapaxes(delta, -1, -2), data_aux.Omega_tril[mod.name]
                )
            )
        return KL

    # One kl_mvn_chol call per matrix size: every KL term's triangular solve
    # shares the same latency-bound (B, m, m+1) dispatch (batch lanes are
    # independent, so each term's value is bit-identical to a per-term call).
    # Warp terms (vgpsa.py:498-516, masked over fixed views) flatten to
    # V*D lanes; data terms (vgpsa.py:520-530) contribute L lanes per
    # modality and share m_G.
    V, D, m_X = mu_q.shape
    mu_p_w = jnp.swapaxes(warp_aux.mu_z, -1, -2)  # (V, D, m)
    groups: Dict[int, list] = {}
    # Fixed views are statically excluded (their masked term is exactly 0 and
    # their aux entries are constant fillers — under the SPMD partitioner a
    # weight-0 filler lane in the merged slab leaked NaN into the fixed
    # view's gradient, so the lanes must not exist rather than be masked).
    active = _active_views(spec)
    Va = len(active)
    merged = spec.merged_factor_dispatch
    # Reuse the explicit Kuu-Cholesky inverses from the factor pass (inverse
    # solve mode): the KL's prior solve becomes one MXU matmul instead of a
    # block-loop triangular-solve dispatch. Value parity is float-level, not
    # bit-exact (tests pin it at ~1e-6 relative).
    use_inv = (
        spec.svgp_solve_mode in ("inverse", "kl_inverse", "mixed")
        and data_aux.Kuu_inv is not None
        and (Va == 0 or warp_aux.Kuu_inv is not None)
    )
    if Va:
        tk = lambda a: _take_active(spec, a, active)
        groups[m_X if merged else "warp"] = [
            (
                tk(mu_q).reshape(Va * D, m_X),
                tk(warp_aux.Omega_tril).reshape(Va * D, m_X, m_X),
                tk(mu_p_w).reshape(Va * D, m_X),
                jnp.broadcast_to(
                    tk(warp_aux.Kuu_chol)[:, None], (Va, D, m_X, m_X)
                ).reshape(Va * D, m_X, m_X),
                jnp.broadcast_to(
                    tk(warp_aux.Kuu_inv)[:, None], (Va, D, m_X, m_X)
                ).reshape(Va * D, m_X, m_X)
                if use_inv
                else None,
            )
        ]
    m_G = spec.m_G
    for mod in spec.modalities:
        delta = hp["delta_F"][mod.name]  # (m_G, L)
        L = delta.shape[-1]
        # Unmerged (model axis shards Omega_sqt_F): each modality solves in
        # its own uniformly-sharded dispatch — mixed-sharding slabs make the
        # SPMD partitioner leak NaN gradients (see compute_factors).
        groups.setdefault(m_G if merged else ("data", mod.name), []).append(
            (
                jnp.swapaxes(delta, -1, -2),  # (L, m_G)
                data_aux.Omega_tril[mod.name],  # (L, m_G, m_G)
                jnp.zeros((L, m_G), delta.dtype),
                jnp.broadcast_to(data_aux.Kuu_chol, (L, m_G, m_G)),
                jnp.broadcast_to(data_aux.Kuu_inv, (L, m_G, m_G))
                if use_inv
                else None,
            )
        )
    KL = jnp.zeros(())
    for size, entries in groups.items():
        mu_q_s = jnp.concatenate([e[0] for e in entries], axis=0)
        Om_s = jnp.concatenate([e[1] for e in entries], axis=0)
        mu_p_s = jnp.concatenate([e[2] for e in entries], axis=0)
        Lp_s = jnp.concatenate([e[3] for e in entries], axis=0)
        Lp_inv_s = (
            jnp.concatenate([e[4] for e in entries], axis=0) if use_inv else None
        )
        KL = KL + jnp.sum(
            kl_mvn_chol(mu_q_s, Om_s, mu_p_s, Lp_s, chol_p_inv=Lp_inv_s, impl=spec.cholesky_impl)
        )
    return KL


def elbo_terms(
    spec: ModelSpec,
    hp: dict,
    batch: Dict[str, Dict[str, jnp.ndarray]],
    result: ForwardResult,
    S: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(expected log-likelihood, KL divergence) — parity: vgpsa.py:491-540."""
    KL = kl_divergence(spec, hp, result.warp_aux, result.data_aux)

    # Masked Gaussian likelihood (vgpsa.py:532-538). Reference quirk kept:
    # exp(noise_variance) + offset is used directly as the Normal *scale*.
    noise_pos = jnp.exp(hp["noise_variance"]) + spec.diagonal_offset
    LL = jnp.zeros(())
    for mm, mod in enumerate(spec.modalities):
        scale = noise_pos[-spec.n_modalities + mm]
        LL = LL + (
            gaussian_loglik_sum(
                batch[mod.name]["outputs"],
                result.F_observed_samples[mod.name],
                scale,
                batch[mod.name]["mask"],
            )
            / S
        )
    return LL, KL


def negative_elbo(
    spec: ModelSpec,
    params: dict,
    consts: dict,
    batch: Dict[str, Dict[str, jnp.ndarray]],
    key: jax.Array,
    S: int,
    temperature=1.0,
) -> jnp.ndarray:
    """The training loss: -E[log p(y|f)] + KL (vgpsa.py:540). One jittable fn.

    ``temperature`` scales the warp-layer sample noise (annealing option;
    1.0 = the exact reparameterized ELBO). With
    ``spec.analytic_data_likelihood`` the data-layer expectation is computed
    in closed form (Rao-Blackwellized over F; only the warp layer is
    sampled), removing the F-sampling gradient noise the reference carries."""
    hp = dict(consts)
    hp.update(params)
    with jax.default_matmul_precision("highest"):
        if spec.analytic_data_likelihood:
            k_warp, _ = jax.random.split(key, 2)
            X_all, _ = _concat_modalities(spec, batch)
            fp = compute_factors(spec, hp)
            _, G_sample_all, warp_aux = warp_layer(
                spec, hp, X_all, k_warp, S, temperature,
                factors=(fp.warp_Kuu_chol, fp.warp_Om_tril, fp.warp_Kuu_inv),
            )
            G_samples = _split_modalities(spec, G_sample_all, axis=2)
            mu_obs, var_obs, data_aux = data_layer_moments(
                spec, hp, G_samples,
                factors=(fp.data_Kuu_chol, fp.data_Om_tril, fp.data_Kuu_inv),
            )
            KL = kl_divergence(spec, hp, warp_aux, data_aux)
            noise_pos = jnp.exp(hp["noise_variance"]) + spec.diagonal_offset
            LL = jnp.zeros(())
            for mm, mod in enumerate(spec.modalities):
                scale = noise_pos[-spec.n_modalities + mm]
                y = batch[mod.name]["outputs"]
                mask = batch[mod.name]["mask"]
                # E_q[log N(y; f, s)] = log N(y; mu, s) - var / (2 s^2)
                lp = (
                    -0.5 * jnp.square((y[None] - mu_obs[mod.name]) / scale)
                    - 0.5 * var_obs[mod.name] / jnp.square(scale)
                    - jnp.log(scale)
                    - 0.5 * _LOG_2PI
                )
                LL = LL + jnp.sum(lp * mask[None, ..., None]) / S
            return -LL + KL
        result = forward(spec, hp, batch, key, S, temperature=temperature)
        LL, KL = elbo_terms(spec, hp, batch, result, S)
        return -LL + KL


def minibatch_spec(spec: ModelSpec, batch_size: int) -> ModelSpec:
    """Host-side: the spec for a ``batch_size``-point-per-view minibatch.

    Every modality's point axis becomes exactly ``batch_size`` (static shape;
    one compiled program regardless of the full data size).
    """
    import dataclasses

    if batch_size < 1:
        raise ValueError(f"minibatch size must be >= 1, got {batch_size}")

    new_mods = tuple(
        dataclasses.replace(
            m,
            n_padded=int(batch_size),
            n_samples=(int(batch_size),) * spec.n_views,
        )
        for m in spec.modalities
    )
    return spec.replace(modalities=new_mods)


def subsample_batch(
    spec: ModelSpec,
    sub_spec: ModelSpec,
    batch: Dict[str, Dict[str, jnp.ndarray]],
    key: jax.Array,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Uniform-with-replacement point subsample per view per modality.

    The returned masks carry ``N_v / B`` importance weights, so the masked
    likelihood sum over the sub-batch is an unbiased estimator of the
    full-data likelihood (stochastic variational inference for sparse GPs,
    Hensman et al. 2013 — the likelihood factorizes per point given the
    variational posteriors, and the KL terms are data-independent). The
    reference trains full-batch only; this makes the per-step cost
    independent of the total spot count.

    Device-side gather: indices are drawn in [0, N_v) (true per-view counts
    are static), so only real points are ever sampled.
    """
    sub = {}
    keys = jax.random.split(key, spec.n_modalities)
    for kk, mod, smod in zip(keys, spec.modalities, sub_spec.modalities):
        B = smod.n_padded
        counts = jnp.asarray(mod.n_samples)[:, None]  # (V, 1) static constants
        idx = jax.random.randint(kk, (spec.n_views, B), 0, counts)
        b = batch[mod.name]
        coords = jnp.take_along_axis(b["coords"], idx[..., None], axis=1)
        outputs = jnp.take_along_axis(b["outputs"], idx[..., None], axis=1)
        weight = jnp.asarray(mod.n_samples, coords.dtype)[:, None] / B
        mask = jnp.broadcast_to(weight, (spec.n_views, B))
        sub[mod.name] = {"coords": coords, "outputs": outputs, "mask": mask}
    return sub


def negative_elbo_minibatch(
    spec: ModelSpec,
    sub_spec: ModelSpec,
    params: dict,
    consts: dict,
    batch: Dict[str, Dict[str, jnp.ndarray]],
    key: jax.Array,
    S: int,
    temperature=1.0,
) -> jnp.ndarray:
    """Unbiased minibatch estimate of the negative ELBO.

    Draws a fresh point subsample (see ``subsample_batch``) and evaluates the
    standard objective on it; E[estimate] over index draws equals the
    full-batch ``negative_elbo`` (likelihood term is linear in per-point
    contributions; KL is computed exactly, unscaled)."""
    k_idx, k_elbo = jax.random.split(key)
    sub = subsample_batch(spec, sub_spec, batch, k_idx)
    return negative_elbo(sub_spec, params, consts, sub, k_elbo, S, temperature)


def predict_mean(
    spec: ModelSpec,
    hp: dict,
    batch: Dict[str, Dict[str, jnp.ndarray]],
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Deterministic posterior prediction at the batch's coordinates.

    Aligned coordinates = warp posterior means; outputs = analytic data-GP
    moments at those means (no Monte-Carlo anywhere). This is the estimator
    the reference approximates by averaging sampled forwards — and then
    outperforms with an external GPR refit on aligned coords
    (two_dimensional_prediction.py:236-244); computing the mean directly
    closes that gap in one call.

    Returns ({mod: G_mean (V, Np, D)}, {mod: F_mean (V, Np, P)},
             {mod: F_var (V, Np, P)}) — latent-function variance; add the
    modality's noise variance for a predictive-y variance.
    """
    with jax.default_matmul_precision("highest"):
        X_all, _ = _concat_modalities(spec, batch)
        dummy_key = jax.random.PRNGKey(0)  # temperature 0: key is unused
        fp = compute_factors(spec, hp)
        G_mean_all, _, _ = warp_layer(
            spec, hp, X_all, dummy_key, 1, 0.0,
            factors=(fp.warp_Kuu_chol, fp.warp_Om_tril, fp.warp_Kuu_inv),
        )
        G_means = _split_modalities(spec, G_mean_all, axis=1)
        G_as_sample = {m: G_means[m][None] for m in spec.modality_names}
        mu_obs, var_obs, _ = data_layer_moments(
            spec, hp, G_as_sample, factors=(fp.data_Kuu_chol, fp.data_Om_tril, fp.data_Kuu_inv)
        )
        return (
            G_means,
            {m: mu_obs[m][0] for m in spec.modality_names},
            {m: var_obs[m][0] for m in spec.modality_names},
        )


def mean_penalty(spec: ModelSpec, hp: dict) -> jnp.ndarray:
    """Parity with gpsa.py:185-191 (defined but never added to the loss in the
    reference; kept for API completeness)."""
    eye = jnp.eye(spec.n_spatial_dims, dtype=hp["mean_slopes"].dtype)
    return spec.mean_penalty_param * jnp.mean(jnp.square(hp["mean_slopes"] - eye))
