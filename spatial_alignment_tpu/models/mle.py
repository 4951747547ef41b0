"""WarpGPMLE — maximum-likelihood (non-variational) GPSA variant.

The reference repo's experiment scripts import ``models.gpsa_mle.WarpGPMLE``
from a pre-packaging layout that no longer exists (SURVEY.md §2.3: the call
pattern survives at
/root/reference/experiments/simulations/two_dimensional_mle.py:63-97 —
``loss_fn(X_spatial, view_idx, data_dict)``, aligned coords in ``model.G`` —
and the plotting callbacks still carry its ``is_mle`` flag). This module
ships that capability, TPU-native.

Model: the aligned coordinates G are a free parameter (initialized at the
observed coords) optimized by maximizing

  log p(G | X)  — per-view, per-dim GP prior of the warp:
                  N(G_vd ; affine(X_v), K_warp(X_v, X_v) + eps I)
  log p(Y | G)  — exact multi-output GP marginal of the data layer:
                  N(Y_p ; 0, K_data(G, G) + sigma^2 I) for each output p

Exact (no inducing points), so cost is O(N^3) per view / O(N_total^3) for
the data term — the MLE variant is for small-N analyses, as in the
reference's usage.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops.kernels import get_kernel, kernel_name
from ..ops.linalg import jittered_cholesky, tri_solve
from .spec import build_spec, create_view_idx_dict, pack_batch, unpack_points
from .params import init_params

_LOG_2PI = float(np.log(2.0 * np.pi))


def _mvn_logpdf_chol(y: jnp.ndarray, mean: jnp.ndarray, chol: jnp.ndarray) -> jnp.ndarray:
    """log N(y; mean, L L^T) for y (..., n); chol (n, n)."""
    n = y.shape[-1]
    w = tri_solve(chol, (y - mean)[..., :, None])[..., 0]
    quad = jnp.sum(jnp.square(w), axis=-1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return -0.5 * (quad + logdet + n * _LOG_2PI)


class WarpGPMLE:
    """MLE GPSA: free aligned coordinates, exact GP marginals."""

    def __init__(
        self,
        data_dict: Dict[str, dict],
        n_spatial_dims: int = 2,
        n_noise_variance_params: int = 2,
        kernel_func_warp="rbf",
        kernel_func_data="rbf",
        n_latent_gps: Optional[Dict[str, Optional[int]]] = None,
        mean_function: str = "identity_fixed",
        fixed_warp_kernel_variances=None,
        fixed_warp_kernel_lengthscales=None,
        fixed_data_kernel_lengthscales=None,
        fixed_view_idx=None,
        *,
        seed: int = 0,
        diagonal_offset: float = 1e-5,
    ):
        del n_spatial_dims  # derived from data (parity with the VI model)
        # m_X/m_G are irrelevant to the exact model; reuse spec machinery
        spec = build_spec(
            data_dict,
            m_X_per_view=1,
            m_G=1,
            n_latent_gps=n_latent_gps,
            kernel_warp=kernel_name(kernel_func_warp),
            kernel_data=kernel_name(kernel_func_data),
            mean_function=mean_function,
            n_noise_variance_params=n_noise_variance_params,
            fixed_view_idx=fixed_view_idx,
            fixed_warp_kernel_variances=fixed_warp_kernel_variances,
            fixed_warp_kernel_lengthscales=fixed_warp_kernel_lengthscales,
            fixed_data_kernel_lengthscales=fixed_data_kernel_lengthscales,
            diagonal_offset=diagonal_offset,
        )
        self.spec = spec
        params, consts, _ = init_params(
            spec,
            data_dict,
            data_init=False,
            seed=seed,
            fixed_warp_kernel_variances=fixed_warp_kernel_variances,
            fixed_warp_kernel_lengthscales=fixed_warp_kernel_lengthscales,
            fixed_data_kernel_lengthscales=fixed_data_kernel_lengthscales,
        )
        # Drop the variational machinery; keep hyperparameters + LMC W
        for k in ["Xtilde", "Gtilde", "delta_G", "Omega_sqt_G", "Omega_sqt_F", "delta_F"]:
            params.pop(k, None)
        self.params, self.consts = params, consts
        self._batch = pack_batch(spec, data_dict)
        # Free aligned coordinates, initialized at the observed coordinates
        self.params["G"] = {
            m: self._batch[m]["coords"] for m in spec.modality_names
        }
        self.fixed_view_idx = fixed_view_idx
        vi, Ns, Ps, n_total = create_view_idx_dict(spec)
        self.view_idx, self.Ns, self.Ps, self.n_total = vi, Ns, Ps, n_total
        self._loss_jit = jax.jit(
            lambda p, c, b: _mle_loss(self.spec, p, c, b)
        )

    # -- reference-parity surface ------------------------------------------
    @property
    def n_views(self):
        return self.spec.n_views

    @property
    def G(self):
        """Aligned coordinates in reference layout {mod: (N, D)}."""
        return {
            m: unpack_points(self.spec, m, np.asarray(self.params["G"][m]))
            for m in self.spec.modality_names
        }

    def train(self):
        return self

    def eval(self):
        return self

    def to(self, device=None):
        return self

    def create_view_idx_dict(self, data_dict):
        from .vgpsa import VariationalGPSA

        return VariationalGPSA.create_view_idx_dict(self, data_dict)

    def forward(self, X_spatial, view_idx=None, Ns=None):
        """No-op pass returning the current aligned coords (the reference MLE
        model's forward mutates state; the loss reads parameters directly)."""
        return self.G

    def loss_fn(self, X_spatial=None, view_idx=None, data_dict=None):
        """Negative joint log-likelihood (reference call pattern:
        two_dimensional_mle.py:88-92)."""
        return self._loss_jit(self.params, self.consts, self._batch)

    def fit(self, n_epochs: int, lr: float = 1e-2, chunk_size: int = 100):
        """Adam training, scanned in on-device chunks (one dispatch per
        chunk, like VariationalGPSA.fit)."""
        tx = optax.adam(lr)
        opt_state = tx.init(self.params)
        spec, consts, batch = self.spec, self.consts, self._batch

        def one(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda p: _mle_loss(spec, p, consts, batch)
            )(params)
            if spec.any_fixed_view:
                # fixed views' aligned coords stay at the observed coords
                fixed = jnp.asarray(spec.fixed_view_mask)[:, None, None]
                grads["G"] = {
                    m: jnp.where(fixed, 0.0, g) for m, g in grads["G"].items()
                }
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
        def loop(carry, n):
            return jax.lax.scan(one, carry, None, length=n)

        losses = np.zeros(n_epochs)
        carry = (self.params, opt_state)
        t = 0
        while t < n_epochs:
            n = min(chunk_size, n_epochs - t)
            carry, chunk_losses = loop(carry, n)
            losses[t : t + n] = np.asarray(chunk_losses)
            t += n
        self.params = carry[0]
        return losses


def _mle_loss(spec, params, consts, batch) -> jnp.ndarray:
    """-[log p(G | X) + log p(Y | G)] with masked padded points."""
    hp = dict(consts)
    hp.update(params)
    kern_w = get_kernel(spec.kernel_warp)
    kern_d = get_kernel(spec.kernel_data)
    eps = spec.diagonal_offset

    with jax.default_matmul_precision("highest"):
        total = jnp.zeros(())

        # Warp prior per view over concatenated modalities
        X_all = jnp.concatenate(
            [batch[m]["coords"] for m in spec.modality_names], axis=1
        )
        G_all = jnp.concatenate(
            [params["G"][m] for m in spec.modality_names], axis=1
        )
        mask_all = jnp.concatenate(
            [batch[m]["mask"] for m in spec.modality_names], axis=1
        )

        def per_view(Xv, Gv, maskv, ls, var, slope, intercept):
            # padded points: kernel row/col ~ 0 + jitter diag; mask the quad
            # term by pinning padded G to its (zero) prior mean
            mu = Xv @ slope + intercept
            Kv = kern_w(Xv, Xv, ls, var)
            # decouple padded rows/cols: zero them, unit diagonal
            m2 = maskv[:, None] * maskv[None, :]
            Kv = Kv * m2 + jnp.diag(1.0 - maskv)
            L = jittered_cholesky(Kv, eps)
            resid = (Gv - mu) * maskv[:, None]
            return jnp.sum(
                jax.vmap(lambda col: _mvn_logpdf_chol(col, 0.0, L), in_axes=1)(resid)
            )

        lp_warp = jax.vmap(per_view)(
            X_all,
            G_all,
            mask_all,
            hp["warp_kernel_lengthscales"],
            hp["warp_kernel_variances"],
            hp["mean_slopes"],
            hp["mean_intercepts"],
        )
        not_fixed = 1.0 - jnp.asarray(spec.fixed_view_mask, lp_warp.dtype)
        total = total + jnp.sum(lp_warp * not_fixed)

        # Data marginal per modality over all views' aligned coords
        noise_pos = jnp.exp(hp["noise_variance"]) + eps
        for mm, mod in enumerate(spec.modalities):
            G = params["G"][mod.name].reshape(-1, spec.n_spatial_dims)
            maskm = batch[mod.name]["mask"].reshape(-1)
            Y = batch[mod.name]["outputs"].reshape(-1, mod.n_outputs)
            Kd = kern_d(G, G, hp["data_kernel_lengthscale"], hp["data_kernel_variance"])
            m2 = maskm[:, None] * maskm[None, :]
            sigma2 = jnp.square(noise_pos[-spec.n_modalities + mm])
            Kd = Kd * m2 + jnp.diag(1.0 - maskm) + sigma2 * jnp.eye(Kd.shape[0])
            L = jittered_cholesky(Kd, eps)
            Ym = Y * maskm[:, None]
            if mod.use_lmc:
                # project outputs onto the latent GPs via W's pseudo-inverse
                # (exact LMC marginal would need a Kronecker solve; the MLE
                # variant in the reference predates LMC — keep it simple)
                W = hp["W"][mod.name]
                Ym = Ym @ jnp.linalg.pinv(W)
            lp = jnp.sum(
                jax.vmap(lambda col: _mvn_logpdf_chol(col, 0.0, L), in_axes=1)(Ym)
            )
            total = total + lp

    return -total
