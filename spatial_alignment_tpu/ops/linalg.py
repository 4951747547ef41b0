"""Numerically-hardened linear algebra for the SVGP layers.

These are the hot primitives of the model (reference call sites:
/root/reference/gpsa/models/vgpsa.py:255-257,314-331,390-426,491-540):
jittered Cholesky, triangular/Cholesky solves, and whitened Gaussian KL.
Everything is batched-first so vmap/jit produce single fused XLA ops that tile
onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = [
    "add_jitter",
    "safe_cholesky",
    "factor_psd_cholesky",
    "cholesky_solve",
    "tri_solve",
    "kl_mvn_chol",
    "kl_whitened",
    "chol_logdet",
]


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


def jittered_cholesky(mat: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Lower Cholesky of mat + jitter * I with spectral-norm-scaled jitter.

    The reference adds an absolute 1e-5 jitter (gpsa.py:153) and relies on
    LAPACK's f32 spotrf, which tolerates the near-singular Gram matrices this
    model produces (lengthscale ~ domain size => condition ~1e7). TPU's
    blocked f32 Cholesky NaNs right at that cliff, killing training.

    The jitter here is ``eps * max(1, |K|_inf)`` — the max-absolute-row-sum
    norm upper-bounds the spectral norm, which is exactly the scale of the
    f32 factorization's eigenvalue perturbation (~ m * ulp * |K|_2). A
    near-rank-1 Gram (lengthscale >> point spread, |K|_2 ~ m * diag) gets
    proportionally more jitter than a well-spread one (|K|_2 ~ diag), each
    with the same ~1e2 relative safety margin, and the max(1, .) guard keeps
    the reference's absolute eps for small-variance kernels.

    CRITICALLY, this jitter is a *continuous* function of the matrix. An
    earlier version probe-selected from a discrete eps/100eps/10000eps ladder;
    measured failure (experiments/out/cliff_introspect.json): when a
    training trajectory moved a Gram's lambda_min across the f32 cliff, the
    selected jitter snapped 100x between steps, the inducing weights
    (K + jI)^-1 Kuf jumped ~100x along near-null eigendirections, and the
    loss exploded -73k -> +1.7e7 in one step (then NaN'd training). A
    continuous jitter cannot produce that cliff.

    One NaN probe (under stop_gradient) is kept as a catastrophe fallback:
    a matrix indefinite beyond -eps * |K|_inf is outside anything f32
    rounding can produce from a PSD kernel, so the 100x escalation branch is
    unreachable in healthy training and the discontinuity it carries is
    acceptable there.
    """
    diag_mean = jnp.maximum(
        1.0, jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1), axis=-1)
    )
    row_norm = jnp.max(jnp.sum(jnp.abs(mat), axis=-1), axis=-1)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    base = (eps * jnp.maximum(diag_mean, row_norm))[..., None, None]

    frozen = jax.lax.stop_gradient(mat)
    L_probe = jnp.linalg.cholesky(frozen + jax.lax.stop_gradient(base) * eye)
    ok = jnp.logical_not(
        jnp.any(jnp.isnan(L_probe), axis=(-2, -1), keepdims=True)
    )
    jitter = jnp.where(ok, base, 100.0 * base)
    return jnp.linalg.cholesky(mat + jitter * eye)


def factor_psd_cholesky(sqt: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Lower Cholesky of ``sqt @ sqt^T + jitter * I`` for a free square factor.

    Used for the variational covariances Omega = Omega_sqt Omega_sqt^T + eps I
    (reference: vgpsa.py:206-210). Unlike the learned-inducing-point Gram
    matrices, this product is PSD *by construction*, so the NaN probe in
    :func:`jittered_cholesky` (an extra factorization per call) is pure
    overhead here and is skipped. The jitter uses the same continuous
    ``eps * max(1, |K|_inf)`` spectral scaling: f32 rounding perturbs
    eigenvalues by ~m * ulp * |K|_2 <= ~2.4e-5 * |K|_inf at m = 200 —
    strictly inside the jitter added below even for a near-rank-1 product,
    so the single factorization cannot NaN for finite inputs.
    """
    mat = sqt @ jnp.swapaxes(sqt, -1, -2)
    diag_mean = jnp.maximum(
        1.0, jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1), axis=-1)
    )
    row_norm = jnp.max(jnp.sum(jnp.abs(mat), axis=-1), axis=-1)
    scale = jnp.maximum(diag_mean, row_norm)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return jnp.linalg.cholesky(mat + (eps * scale)[..., None, None] * eye)


def _broadcast_mats(a: jnp.ndarray, b: jnp.ndarray):
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    return (
        jnp.broadcast_to(a, batch + a.shape[-2:]),
        jnp.broadcast_to(b, batch + b.shape[-2:]),
    )


def tri_solve(chol: jnp.ndarray, rhs: jnp.ndarray, *, trans: bool = False) -> jnp.ndarray:
    """Solve L x = rhs (or L^T x = rhs when trans) with L lower triangular.

    Batched; leading dims of the two args broadcast against each other.
    """
    chol, rhs = _broadcast_mats(chol, rhs)
    return jsl.solve_triangular(chol, rhs, lower=True, trans=1 if trans else 0)


def cholesky_solve(chol: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = rhs given A = L L^T (parity with torch.cholesky_solve).

    Batched; leading dims of the two args broadcast against each other.
    """
    chol, rhs = _broadcast_mats(chol, rhs)
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
) -> jnp.ndarray:
    """KL( N(mu_q, Lq Lq^T) || N(mu_p, Lp Lp^T) ), batched over leading dims.

    Closed form evaluated directly from the Cholesky factors (the reference
    builds torch MultivariateNormal objects for this; vgpsa.py:498-530):
      0.5 * [ tr(Sp^-1 Sq) + (mu_p - mu_q)^T Sp^-1 (mu_p - mu_q)
              - k + log|Sp| - log|Sq| ]
    """
    k = mu_q.shape[-1]
    # tr(Sp^-1 Sq) = |Lp^-1 Lq|_F^2
    m = tri_solve(chol_p, chol_q)
    trace_term = jnp.sum(jnp.square(m), axis=(-2, -1))
    # quadratic term via one triangular solve
    diff = (mu_p - mu_q)[..., :, None]
    quad = jnp.sum(jnp.square(tri_solve(chol_p, diff)), axis=(-2, -1))
    logdet = chol_logdet(chol_p) - chol_logdet(chol_q)
    return 0.5 * (trace_term + quad - k + logdet)
