"""Unit tests: linalg primitives vs dense numpy references."""

import pytest
import numpy as np
import jax.numpy as jnp

from spatial_alignment_tpu.ops.linalg import (
    add_jitter,
    safe_cholesky,
    factor_psd_cholesky,
    cholesky_solve,
    tri_solve,
    kl_mvn_chol,
    chol_logdet,
)


def _rand_spd(rng, n, batch=()):
    a = rng.standard_normal(batch + (n, n))
    return a @ np.swapaxes(a, -1, -2) + n * np.eye(n)


def test_cholesky_solve_matches_dense(rng):
    A = _rand_spd(rng, 6).astype(np.float32)
    b = rng.standard_normal((6, 3)).astype(np.float32)
    L = safe_cholesky(jnp.asarray(A))
    x = np.asarray(cholesky_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-3, atol=1e-4)


def test_cholesky_solve_broadcasts_batch(rng):
    A = _rand_spd(rng, 5).astype(np.float32)
    b = rng.standard_normal((4, 5, 2)).astype(np.float32)
    L = safe_cholesky(jnp.asarray(A))
    x = np.asarray(cholesky_solve(L, jnp.asarray(b)))  # chol unbatched, rhs batched
    for i in range(4):
        np.testing.assert_allclose(x[i], np.linalg.solve(A, b[i]), rtol=1e-3, atol=1e-4)


def test_tri_solve_trans(rng):
    A = _rand_spd(rng, 5).astype(np.float32)
    L = np.linalg.cholesky(A)
    b = rng.standard_normal((5, 2)).astype(np.float32)
    got = np.asarray(tri_solve(jnp.asarray(L), jnp.asarray(b), trans=True))
    np.testing.assert_allclose(got, np.linalg.solve(L.T, b), rtol=1e-3, atol=1e-4)


def test_chol_logdet(rng):
    A = _rand_spd(rng, 7)
    L = np.linalg.cholesky(A)
    got = float(chol_logdet(jnp.asarray(L, jnp.float32)))
    np.testing.assert_allclose(got, np.linalg.slogdet(A)[1], rtol=1e-4)


def _kl_dense(mu_q, Sq, mu_p, Sp):
    k = len(mu_q)
    Sp_inv = np.linalg.inv(Sp)
    return 0.5 * (
        np.trace(Sp_inv @ Sq)
        + (mu_p - mu_q) @ Sp_inv @ (mu_p - mu_q)
        - k
        + np.linalg.slogdet(Sp)[1]
        - np.linalg.slogdet(Sq)[1]
    )


def test_kl_mvn_matches_dense(rng):
    n = 6
    Sq = _rand_spd(rng, n)
    Sp = _rand_spd(rng, n)
    mu_q = rng.standard_normal(n)
    mu_p = rng.standard_normal(n)
    got = float(
        kl_mvn_chol(
            jnp.asarray(mu_q, jnp.float32),
            jnp.asarray(np.linalg.cholesky(Sq), jnp.float32),
            jnp.asarray(mu_p, jnp.float32),
            jnp.asarray(np.linalg.cholesky(Sp), jnp.float32),
        )
    )
    np.testing.assert_allclose(got, _kl_dense(mu_q, Sq, mu_p, Sp), rtol=1e-3)


def test_kl_self_is_zero(rng):
    n = 5
    S = _rand_spd(rng, n)
    mu = rng.standard_normal(n)
    L = jnp.asarray(np.linalg.cholesky(S), jnp.float32)
    m = jnp.asarray(mu, jnp.float32)
    assert abs(float(kl_mvn_chol(m, L, m, L))) < 1e-3


def test_kl_batched_layout(rng):
    # (V, D) batch of KLs — the shape used by the warp-layer KL
    V, D, n = 3, 2, 4
    Sq = _rand_spd(rng, n, (V, D))
    Sp = _rand_spd(rng, n, (V,))
    mu_q = rng.standard_normal((V, D, n))
    mu_p = rng.standard_normal((V, D, n))
    got = np.asarray(
        kl_mvn_chol(
            jnp.asarray(mu_q, jnp.float32),
            jnp.asarray(np.linalg.cholesky(Sq), jnp.float32),
            jnp.asarray(mu_p, jnp.float32),
            jnp.asarray(np.linalg.cholesky(Sp), jnp.float32)[:, None],
        )
    )
    assert got.shape == (V, D)
    for v in range(V):
        for d in range(D):
            np.testing.assert_allclose(
                got[v, d], _kl_dense(mu_q[v, d], Sq[v, d], mu_p[v, d], Sp[v]), rtol=1e-3
            )


def test_factor_psd_cholesky_matches_probed_path(rng):
    """The probe-free Omega factorization must equal jittered_cholesky on the
    same product (same diag-scaled jitter; only the NaN probes are skipped)."""
    from spatial_alignment_tpu.ops.linalg import jittered_cholesky

    for scale in (1.0, 50.0):  # exercise the max(1, mean diag) jitter scaling
        sqt = jnp.asarray(scale * rng.standard_normal((7, 12, 12)), jnp.float32)
        got = np.asarray(factor_psd_cholesky(sqt, 1e-5))
        want = np.asarray(
            jittered_cholesky(sqt @ jnp.swapaxes(sqt, -1, -2), 1e-5)
        )
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_factor_psd_cholesky_rank_deficient_factor(rng):
    """A rank-deficient factor (worst case for by-construction PSD) still
    factorizes finitely thanks to the jitter."""
    low = jnp.asarray(rng.standard_normal((9, 2)), jnp.float32)
    sqt = jnp.concatenate([low, jnp.zeros((9, 7), jnp.float32)], axis=1)
    L = np.asarray(factor_psd_cholesky(sqt, 1e-5))
    assert np.isfinite(L).all()
    # Reconstructs the product plus the diag-scaled jitter
    # eps * max(1, mean diag) on the diagonal.
    mat = np.asarray(sqt @ sqt.T, np.float64)
    jitter = 1e-5 * max(1.0, float(np.diag(mat).mean()))
    np.testing.assert_allclose(
        L @ L.T, mat + jitter * np.eye(9), rtol=1e-4, atol=1e-5
    )


def test_add_jitter():
    A = jnp.zeros((3, 4, 4))
    J = np.asarray(add_jitter(A, 0.5))
    np.testing.assert_allclose(J, np.tile(0.5 * np.eye(4)[None], (3, 1, 1)))


def test_jittered_cholesky_continuous_across_f32_cliff(rng):
    """The effective jitter must vary continuously as a Gram's lambda_min
    crosses the f32 Cholesky failure threshold.

    Regression for the epoch-4119 training cliff
    (experiments/out/cliff_introspect.json): the earlier probe-ladder
    implementation snapped jitter 100x between adjacent optimization steps
    when a borderline matrix drifted across the cliff, which made
    (K + jI)^-1 Kuf jump ~100x along near-null eigendirections and exploded
    the loss. The fixed design uses a deterministic noise-floor jitter
    max(eps * diag_guard, 0.5 sqrt(m) ulp |K|_inf): for a large-norm
    near-rank-1 Gram (the cliff regime) the floor sits ABOVE the whole
    f32-rounding band, so sweeping lambda_min through the band must leave
    the jitter essentially constant — no escalation branch ever fires.
    """
    from spatial_alignment_tpu.ops.linalg import jittered_cholesky

    m = 150
    X = rng.uniform(0, 10, (m, 2))
    d2 = ((X[:, None] - X[None]) ** 2).sum(-1)
    K0 = np.exp(-d2 / (2 * 20.0**2))  # lengthscale >> spread: near rank-1
    jitters = []
    for t in np.linspace(-2e-5, 2e-5, 41):
        K = jnp.asarray(K0 + t * np.eye(m), jnp.float32)
        L = np.asarray(jittered_cholesky(K, 1e-5), np.float64)
        assert np.isfinite(L).all()
        implied = np.mean(np.diag(L @ L.T - np.asarray(K, np.float64)))
        jitters.append(implied)
    jitters = np.asarray(jitters)
    assert jitters.min() > 0
    assert jitters.max() / jitters.min() < 1.5, jitters
    # And the floor is far below the old ladder's 100x rung (sharper prior).
    assert jitters.max() < 5e-4


@pytest.mark.parametrize("m,lengthscale", [(25, 5.0), (50, 20.0)])
def test_jittered_cholesky_small_gram_keeps_reference_eps(rng, m, lengthscale):
    """Accuracy pin (measured property 1 of the jitter design): Grams below
    the static floor gate (m < 64) must receive exactly the reference-scale
    eps * max(1, mean diag), even when saturated (lengthscale >> spread) —
    an 8-restart bisection showed a 1.3-1.9x always-on boost over eps
    regresses EVERY restart's converged de-novo alignment ~4x
    (experiments/out/jitter_bisect_*.json: best 3.7e-4 -> 1.6e-3). The
    m=50 saturated case is the exact regression: any dynamic-norm floor
    formula that protects m >= 100 crosses eps here."""
    from spatial_alignment_tpu.ops.linalg import jittered_cholesky

    X = rng.uniform(0, 10, (m, 2))
    d2 = ((X[:, None] - X[None]) ** 2).sum(-1)
    K = jnp.asarray(np.exp(-d2 / (2 * lengthscale**2)), jnp.float32)
    L = np.asarray(jittered_cholesky(K, 1e-5), np.float64)
    assert np.isfinite(L).all()
    implied = np.mean(np.diag(L @ L.T - np.asarray(K, np.float64)))
    np.testing.assert_allclose(implied, 1e-5, rtol=0.2)


def test_jittered_cholesky_escalates_for_genuinely_indefinite(rng):
    """Matrices indefinite beyond anything f32 rounding can produce still
    factor finitely through the catastrophe-fallback escalation branch."""
    from spatial_alignment_tpu.ops.linalg import jittered_cholesky

    m = 20
    q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = rng.uniform(0.5, 2.0, size=m)
    lam[0] = -5e-4  # far below -eps * |K|_inf, unreachable by rounding
    K = (q * lam) @ q.T
    K = jnp.asarray((K + K.T) / 2, jnp.float32)
    L = np.asarray(jittered_cholesky(K, 1e-5))
    assert np.isfinite(L).all()
