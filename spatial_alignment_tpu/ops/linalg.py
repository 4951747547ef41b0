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
    """Lower Cholesky of mat + jitter * I with NaN-probed jitter escalation.

    The reference adds an absolute 1e-5 jitter (gpsa.py:153) and relies on
    LAPACK's f32 spotrf, which tolerates the near-singular Gram matrices this
    model produces (lengthscale ~ domain size => condition ~1e7). TPU's
    blocked f32 Cholesky NaNs right at that cliff, killing training.

    Strategy (branchless, XLA-friendly, clean gradients):
      1. probe-factorize under stop_gradient at jitter eps and 100*eps,
      2. per matrix in the batch, select the smallest jitter whose probe was
         NaN-free (eps -> 100*eps -> 10000*eps),
      3. run the single differentiable Cholesky at the selected jitter.

    Healthy matrices get exactly the reference's eps (scaled by max(1, mean
    diag) so a learned kernel variance > 1 keeps the jitter proportionate);
    only matrices that would have NaN'd get more. Probe cost is 2 extra m^3
    factorizations of m <= ~200 matrices — noise next to the Gram work.
    """
    diag_mean = jnp.maximum(
        1.0, jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1), axis=-1)
    )
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    base = (eps * diag_mean)[..., None, None]

    frozen = jax.lax.stop_gradient(mat)

    def probe_ok(jit_scale):
        L = jnp.linalg.cholesky(frozen + jit_scale * base * eye)
        return jnp.logical_not(
            jnp.any(jnp.isnan(L), axis=(-2, -1), keepdims=True)
        )

    ok1 = probe_ok(1.0)
    ok2 = probe_ok(100.0)
    jitter = jnp.where(ok1, base, jnp.where(ok2, 100.0 * base, 10000.0 * base))
    return jnp.linalg.cholesky(mat + jitter * eye)


def factor_psd_cholesky(sqt: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Lower Cholesky of ``sqt @ sqt^T + jitter * I`` for a free square factor.

    Used for the variational covariances Omega = Omega_sqt Omega_sqt^T + eps I
    (reference: vgpsa.py:206-210). Unlike the learned-inducing-point Gram
    matrices, this product is PSD *by construction*, so the NaN-probed jitter
    escalation in :func:`jittered_cholesky` (2 extra probe factorizations per
    call) is pure overhead here and is skipped. f32 rounding can perturb
    eigenvalues by ~m * ulp * mean(diag) ≈ 5e-6 * mean(diag) at m = 200 —
    strictly inside the eps * max(1, mean(diag)) jitter added below, so the
    single factorization cannot NaN for finite inputs.
    """
    mat = sqt @ jnp.swapaxes(sqt, -1, -2)
    diag_mean = jnp.maximum(
        1.0, jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1), axis=-1)
    )
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return jnp.linalg.cholesky(mat + (eps * diag_mean)[..., None, None] * eye)


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
