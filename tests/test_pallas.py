"""Pallas Gram kernel vs the jnp reference, in interpreter mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from spatial_alignment_tpu.ops import kernels
from spatial_alignment_tpu.ops.pallas_gram import pallas_gram, gram, _HAS_PALLAS

pytestmark = pytest.mark.skipif(not _HAS_PALLAS, reason="pallas unavailable")


@pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32"])
@pytest.mark.parametrize("shape", [(7, 50), (50, 200), (64, 512)])
def test_pallas_gram_matches_jnp(rng, kind, shape):
    m, n = shape
    x1 = rng.uniform(0, 10, (m, 2)).astype(np.float32)
    x2 = rng.uniform(0, 10, (n, 2)).astype(np.float32)
    log_ls, log_var = 0.4, -0.2
    got = np.asarray(
        pallas_gram(jnp.asarray(x1), jnp.asarray(x2), log_ls, log_var, kind, interpret=True)
    )
    want = np.asarray(
        kernels.get_kernel(kind)(jnp.asarray(x1), jnp.asarray(x2), log_ls, log_var)
    )
    assert got.shape == (m, n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_gram_batched(rng):
    x1 = rng.uniform(0, 5, (10, 3)).astype(np.float32)
    x2 = rng.uniform(0, 5, (4, 33, 3)).astype(np.float32)
    got = np.asarray(
        pallas_gram(jnp.asarray(x1), jnp.asarray(x2), 0.1, 0.2, "rbf", interpret=True)
    )
    assert got.shape == (4, 10, 33)
    want = np.asarray(
        kernels.rbf_kernel(jnp.asarray(x1)[None], jnp.asarray(x2), 0.1, 0.2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gram_dispatcher_jnp_path(rng):
    # On CPU the dispatcher must take the jnp path and agree with the kernel fn
    x1 = rng.uniform(0, 5, (6, 2)).astype(np.float32)
    x2 = rng.uniform(0, 5, (3, 11, 2)).astype(np.float32)
    got = np.asarray(gram(jnp.asarray(x1), jnp.asarray(x2), 0.3, 0.1, "rbf"))
    want = np.asarray(kernels.rbf_kernel(jnp.asarray(x1)[None], jnp.asarray(x2), 0.3, 0.1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32"])
def test_gram_custom_vjp_matches_autodiff(rng, kind):
    """gram's closed-form backward must equal autodiff through the jnp kernel."""
    import jax

    x1 = jnp.asarray(rng.uniform(0, 5, (6, 2)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 5, (3, 9, 2)), jnp.float32)
    ls = jnp.asarray([0.4], jnp.float32)
    var = jnp.asarray([-0.1], jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 6, 9)), jnp.float32)

    def loss_gram(x1, x2, ls, var):
        return jnp.sum(w * gram(x1, x2, ls, var, kind, False))

    def loss_ref(x1, x2, ls, var):
        return jnp.sum(w * kernels.get_kernel(kind)(x1[None], x2, ls, var))

    g1 = jax.grad(loss_gram, argnums=(0, 1, 2, 3))(x1, x2, ls, var)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x1, x2, ls, var)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_gram_custom_vjp_under_vmap(rng):
    """The warp layer calls gram under vmap over views."""
    import jax

    x1 = jnp.asarray(rng.uniform(0, 5, (2, 5, 2)), jnp.float32)  # (V, m, D)
    x2 = jnp.asarray(rng.uniform(0, 5, (2, 7, 2)), jnp.float32)  # (V, N, D)
    ls = jnp.asarray([0.3, 0.5], jnp.float32)

    def per_view(a, b, l):
        return jnp.sum(gram(a, b, l, 0.2, "rbf", False))

    def loss(x1, x2, ls):
        return jnp.sum(jax.vmap(per_view)(x1, x2, ls))

    def loss_ref(x1, x2, ls):
        return jnp.sum(
            jax.vmap(lambda a, b, l: jnp.sum(kernels.rbf_kernel(a, b, l, 0.2)))(x1, x2, ls)
        )

    g1 = jax.grad(loss, argnums=(0, 1, 2))(x1, x2, ls)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x1, x2, ls)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
