"""`VariationalGPSA` — the user-facing model, API-compatible with the
reference (/root/reference/gpsa/models/vgpsa.py:14-540) but built as a thin
stateful shell around the pure-functional core:

  * construction = derive a static ``ModelSpec`` + initialize a parameter
    pytree (host-side k-means, sklearn, like vgpsa.py:61-92);
  * ``forward`` / ``loss_fn`` keep the reference's call contract
    (README.md:49-134, examples/grid_example.py:62-78) and return arrays in
    the reference's concatenated-per-view layout;
  * the hot path is ``make_train_step`` / ``fit``: one jitted
    value-and-grad + Adam update over the whole ELBO graph.

Semantic divergences from the reference (all documented in SURVEY.md §2.4 and
deliberate):
  - warp samples use sqrt(variance) as the Normal scale unless
    ``reference_sample_scale=True`` (vgpsa.py:334-340 bug);
  - Omega_sqt_G uses one consistent (view, dim) layout (vgpsa.py:142 vs 336);
  - the fixed view's unread ``mu_z *= 100`` (vgpsa.py:230-235) and the dead
    ``minmax_init`` / ``mean_penalty`` options are not replicated;
  - no global autograd anomaly mode (vgpsa.py:9).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops.kernels import kernel_name
from . import core
from .params import init_params, merge_hyperparams
from .spec import (
    ModelSpec,
    build_spec,
    create_view_idx_dict,
    pack_batch,
    pack_coords,
    unpack_points,
    view_slices,
    _as_numpy,
)


_DEFAULT_LR = 1e-2  # shared by fit() and fit_multistart's recipe resolution


class _hybridmethod:
    """Descriptor: method receives the instance when called on one, the class
    when called on the class (used so ``VariationalGPSA.load(path)`` builds a
    model from a self-contained checkpoint while ``model.load(path)`` keeps
    restoring in place)."""

    def __init__(self, fn):
        self.fn = fn
        self.__doc__ = fn.__doc__

    def __get__(self, obj, objtype=None):
        return partial(self.fn, obj if obj is not None else objtype)


def _nest_flat(flat: dict) -> dict:
    """Rebuild a nested string-keyed dict pytree from slash-joined paths
    (the params/consts/batch pytrees are all nested dicts)."""
    out: dict = {}
    for key, arr in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(arr)
    return out


def _tree_equal(a: dict, b: dict) -> bool:
    """Structural + value equality of two small parameter pytrees."""
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    return ta == tb and len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def _resolve_recipe(
    recipe, lr, n_epochs, optimizer, warp_temperature_schedule, opt_cache=None
):
    """Expand a named training recipe into (optimizer, temperature schedule).

    "accurate" = Adam under cosine lr decay to lr/100 + the temperature-0
    (deterministic-warp) objective — the converged-accuracy recipe
    (experiments/out/parity_vs_reference.json). Explicitly-passed
    optimizer/schedule always win.

    ``opt_cache`` (a dict) memoizes the constructed optimizer per
    (recipe, lr, n_epochs): _cached_train_loop keys the compiled scan on
    optimizer *identity*, so a fresh optax object per fit() call would force
    a retrace+recompile every time a recipe is used.
    """
    if recipe is not None:
        if recipe not in ("plain", "accurate"):
            raise ValueError(f"unknown recipe {recipe!r}")
        if recipe == "accurate":
            if optimizer is None:
                key = (recipe, lr, n_epochs)
                if opt_cache is not None and key in opt_cache:
                    optimizer = opt_cache[key]
                else:
                    optimizer = optax.adam(
                        optax.cosine_decay_schedule(lr, n_epochs, alpha=1e-2)
                    )
                    if opt_cache is not None:
                        opt_cache[key] = optimizer
            if warp_temperature_schedule is None:
                warp_temperature_schedule = lambda t: np.zeros_like(
                    np.asarray(t, np.float32)
                )
    return optimizer, warp_temperature_schedule


def default_prng_impl() -> str:
    """The library's PRNG implementation: the hardware rbg generator on TPU
    (threefry's serial bit math costs a measured 2-2.6% of end-to-end step
    throughput at both bench configs, experiments/out/solve_prng_step_ab.json),
    jax's default threefry elsewhere. Per-model typed keys — no process-global
    config mutation; sample streams differ between impls, which this model
    makes no claims about (SURVEY.md §7 "RNG")."""
    return "rbg" if jax.default_backend() in ("tpu", "axon") else "threefry2x32"


def make_key(seed: int) -> jax.Array:
    """A typed PRNG key under the library's default impl (see
    :func:`default_prng_impl`)."""
    return jax.random.key(int(seed), impl=default_prng_impl())


@partial(jax.jit, static_argnames=("spec", "S"))
def _jit_neg_elbo(spec, params, consts, batch, key, S):
    return core.negative_elbo(spec, params, consts, batch, key, S)


@partial(jax.jit, static_argnames=("spec", "S", "with_test"))
def _jit_forward(spec, hp, batch, key, S, G_test=None, with_test=False):
    return core.forward(spec, hp, batch, key, S, G_test=G_test if with_test else None)


@partial(jax.jit, static_argnames=("spec",))
def _jit_predict_mean(spec, hp, batch):
    return core.predict_mean(spec, hp, batch)


class VariationalGPSA:
    """Deep-GP spatial alignment model (TPU-native rebuild of reference GPSA)."""

    def __init__(
        self,
        data_dict: Dict[str, dict],
        m_X_per_view: int,
        m_G: int,
        data_init: bool = True,
        minmax_init: bool = False,  # accepted-but-dead in the reference (vgpsa.py:21)
        grid_init: bool = False,
        n_spatial_dims: int = 2,  # derived from data, kept for signature parity
        n_noise_variance_params: int = 2,
        kernel_func_warp="rbf",
        kernel_func_data="rbf",
        n_latent_gps: Optional[Dict[str, Optional[int]]] = None,
        mean_function: str = "identity_fixed",
        mean_penalty_param: float = 0.0,
        fixed_warp_kernel_variances=None,
        fixed_warp_kernel_lengthscales=None,
        fixed_data_kernel_lengthscales=None,
        fixed_view_idx=None,
        *,
        seed: int = 0,
        reference_sample_scale: bool = False,
        diagonal_offset: float = 1e-5,
        pad_multiple: int = 1,
        data_chunk_size: Optional[int] = None,
        analytic_data_likelihood: bool = False,
        svgp_matmul_precision: str = "auto",
        svgp_variance_precision: str = "auto",
        svgp_solve_mode: str = "auto",
        triangular_variational: bool = False,
        whitened_variational: bool = False,
        cholesky_impl: str = "auto",
        quad_diag_impl: str = "auto",
        fused_factor_inverse: str = "auto",
    ):
        del n_spatial_dims, minmax_init  # shape-driven / dead (SURVEY.md §2.4.5-6)
        spec = build_spec(
            data_dict,
            m_X_per_view=m_X_per_view,
            m_G=m_G,
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
            reference_sample_scale=reference_sample_scale,
            mean_penalty_param=mean_penalty_param,
            pad_multiple=pad_multiple,
            data_chunk_size=data_chunk_size,
            analytic_data_likelihood=analytic_data_likelihood,
            svgp_matmul_precision=svgp_matmul_precision,
            svgp_variance_precision=svgp_variance_precision,
            svgp_solve_mode=svgp_solve_mode,
            triangular_variational=triangular_variational,
            whitened_variational=whitened_variational,
            cholesky_impl=cholesky_impl,
            quad_diag_impl=quad_diag_impl,
            fused_factor_inverse=fused_factor_inverse,
        )
        self.params, self.consts, self.spec = init_params(
            spec,
            data_dict,
            data_init=data_init,
            grid_init=grid_init,
            seed=seed,
            fixed_warp_kernel_variances=fixed_warp_kernel_variances,
            fixed_warp_kernel_lengthscales=fixed_warp_kernel_lengthscales,
            fixed_data_kernel_lengthscales=fixed_data_kernel_lengthscales,
        )
        self._key = make_key(seed)
        self._batch = pack_batch(self.spec, data_dict)
        self._last_aux = None  # (hp, warp_aux, data_aux) from the last forward
        # Kept for reinitialize()/fit_multistart (host-side re-init only).
        self._init_args = dict(
            data_dict=data_dict, data_init=data_init, grid_init=grid_init,
            fixed_warp_kernel_variances=fixed_warp_kernel_variances,
            fixed_warp_kernel_lengthscales=fixed_warp_kernel_lengthscales,
            fixed_data_kernel_lengthscales=fixed_data_kernel_lengthscales,
        )
        # Full constructor config (minus data) — lets fit_multistart build a
        # structurally identical sub-model on a train/holdout split.
        self._ctor_kwargs = dict(
            m_X_per_view=m_X_per_view, m_G=m_G, data_init=data_init,
            grid_init=grid_init,
            n_noise_variance_params=n_noise_variance_params,
            kernel_func_warp=kernel_func_warp,
            kernel_func_data=kernel_func_data,
            n_latent_gps=n_latent_gps, mean_function=mean_function,
            mean_penalty_param=mean_penalty_param,
            fixed_warp_kernel_variances=fixed_warp_kernel_variances,
            fixed_warp_kernel_lengthscales=fixed_warp_kernel_lengthscales,
            fixed_data_kernel_lengthscales=fixed_data_kernel_lengthscales,
            fixed_view_idx=fixed_view_idx, seed=seed,
            reference_sample_scale=reference_sample_scale,
            diagonal_offset=diagonal_offset, pad_multiple=pad_multiple,
            data_chunk_size=data_chunk_size,
            analytic_data_likelihood=analytic_data_likelihood,
            svgp_matmul_precision=svgp_matmul_precision,
            svgp_variance_precision=svgp_variance_precision,
            svgp_solve_mode=svgp_solve_mode,
            triangular_variational=triangular_variational,
            whitened_variational=whitened_variational,
            cholesky_impl=cholesky_impl,
            quad_diag_impl=quad_diag_impl,
            fused_factor_inverse=fused_factor_inverse,
        )

        # Reference-parity bookkeeping attributes (used by plotting callbacks)
        self.fixed_view_idx = fixed_view_idx
        vi, Ns, Ps, n_total = create_view_idx_dict(self.spec)
        self.view_idx, self.Ns, self.Ps, self.n_total = vi, Ns, Ps, n_total
        self.n_latent_gps = (
            n_latent_gps
            if n_latent_gps is not None
            else {m: None for m in self.spec.modality_names}
        )

    # ------------------------------------------------------------------
    # Reference-parity surface
    # ------------------------------------------------------------------
    @property
    def n_views(self) -> int:
        return self.spec.n_views

    @property
    def n_spatial_dims(self) -> int:
        return self.spec.n_spatial_dims

    @property
    def modality_names(self):
        return list(self.spec.modality_names)

    @property
    def m_X_per_view(self) -> int:
        return self.spec.m_X_per_view

    @property
    def m_G(self) -> int:
        return self.spec.m_G

    @property
    def Xtilde(self) -> np.ndarray:
        return np.asarray(self.params["Xtilde"])

    @property
    def Gtilde(self) -> np.ndarray:
        return np.asarray(self.params["Gtilde"])

    def train(self):  # torch-API shims: the jax model has no modes
        return self

    def eval(self):
        return self

    def to(self, device=None):
        return self

    def parameters(self):
        return jax.tree.leaves(self.params)

    def create_view_idx_dict(self, data_dict):
        """Parity with gpsa.py:155-183 — works on arbitrary data_dicts."""
        view_idx, Ns, Ps = {}, {}, {}
        n_total = 0
        for mod in data_dict.keys():
            n_samples_list = data_dict[mod]["n_samples_list"]
            Ns[mod] = int(np.sum(n_samples_list))
            n_total += Ns[mod]
            Ps[mod] = int(_as_numpy(data_dict[mod]["outputs"]).shape[1])
            cs = np.insert(np.cumsum(n_samples_list), 0, 0)
            view_idx[mod] = [
                np.arange(cs[ii], cs[ii + 1]) for ii in range(self.n_views)
            ]
        return view_idx, Ns, Ps, n_total

    # ------------------------------------------------------------------
    # Forward / loss (reference call contract)
    # ------------------------------------------------------------------
    def _eval_spec(self, view_idx) -> ModelSpec:
        """Spec for a (possibly different-sized) coordinate set, e.g. held-out
        prediction (two_dimensional_prediction.py:199-207)."""
        counts = {
            mod: tuple(len(view_idx[mod][v]) for v in range(self.n_views))
            for mod in self.spec.modality_names
        }
        if all(counts[m.name] == m.n_samples for m in self.spec.modalities):
            return self.spec
        new_mods = tuple(
            dataclasses.replace(
                m,
                n_samples=counts[m.name],
                n_padded=max(max(counts[m.name]), 1),
            )
            for m in self.spec.modalities
        )
        return self.spec.replace(modalities=new_mods)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def forward(
        self,
        X_spatial: Dict[str, np.ndarray],
        view_idx=None,
        Ns=None,
        S: int = 1,
        prediction_mode: bool = False,
        G_test: Optional[Dict[str, np.ndarray]] = None,
        key: Optional[jax.Array] = None,
    ):
        """Reference-layout forward pass (vgpsa.py:212-489).

        Returns (G_means, G_samples, F_latent_samples, F_observed_samples)
        with concatenated-per-view arrays, plus the two ``*_test`` dicts when
        ``G_test`` is given.
        """
        del Ns, prediction_mode  # shapes are derived; no train/eval modes
        if view_idx is None:
            view_idx = self.view_idx
        spec = self._eval_spec(view_idx)
        hp = merge_hyperparams(self.params, self.consts)

        # Build a coords+mask batch (outputs unused by forward)
        all_coords = pack_coords(spec, X_spatial)
        batch = {}
        for mod in spec.modalities:
            coords = all_coords[mod.name]
            mask = np.zeros((spec.n_views, mod.n_padded), np.float32)
            for v, (lo, hi) in enumerate(view_slices(mod.n_samples)):
                mask[v, : hi - lo] = 1.0
            batch[mod.name] = {
                "coords": coords,
                "mask": jnp.asarray(mask),
                "outputs": jnp.zeros(
                    (spec.n_views, mod.n_padded, mod.n_outputs), jnp.float32
                ),
            }

        if key is None:
            key = self._next_key()
        G_test_j = (
            {m: jnp.asarray(_as_numpy(v), jnp.float32) for m, v in G_test.items()}
            if G_test is not None
            else None
        )
        result = _jit_forward(
            spec, hp, batch, key, S, G_test=G_test_j, with_test=G_test is not None
        )
        self._last_aux = (hp, result.warp_aux, result.data_aux)

        G_means = {m: unpack_points(spec, m, result.G_means[m]) for m in spec.modality_names}
        G_samples = {
            m: unpack_points(spec, m, result.G_samples[m]) for m in spec.modality_names
        }
        F_latent = {
            m: unpack_points(spec, m, result.F_latent_samples[m])
            for m in spec.modality_names
        }
        F_obs = {
            m: unpack_points(spec, m, result.F_observed_samples[m])
            for m in spec.modality_names
        }
        if G_test is not None:
            return (
                G_means,
                G_samples,
                F_latent,
                F_obs,
                {m: np.asarray(v) for m, v in result.F_latent_samples_test.items()},
                {m: np.asarray(v) for m, v in result.F_observed_samples_test.items()},
            )
        return G_means, G_samples, F_latent, F_obs

    def predict(self, X_spatial: Dict[str, np.ndarray], view_idx=None, Ns=None):
        """Deterministic posterior prediction at (possibly new) coordinates.

        Returns (G_means, F_mean, F_var) in reference layout — aligned
        coordinates from the warp posterior mean, and the data GP's analytic
        output moments at them (no sampling). Prefer this over averaging
        sampled ``forward`` outputs for held-out prediction.
        """
        del Ns
        if view_idx is None:
            view_idx = self.view_idx
        spec = self._eval_spec(view_idx)
        hp = merge_hyperparams(self.params, self.consts)
        all_coords = pack_coords(spec, X_spatial)
        batch = {}
        for mod in spec.modalities:
            mask = np.zeros((spec.n_views, mod.n_padded), np.float32)
            for v, (lo, hi) in enumerate(view_slices(mod.n_samples)):
                mask[v, : hi - lo] = 1.0
            batch[mod.name] = {
                "coords": all_coords[mod.name],
                "mask": jnp.asarray(mask),
                "outputs": jnp.zeros(
                    (spec.n_views, mod.n_padded, mod.n_outputs), jnp.float32
                ),
            }
        G_means, F_mean, F_var = _jit_predict_mean(spec, hp, batch)
        unpack = lambda d: {m: unpack_points(spec, m, d[m]) for m in spec.modality_names}
        return unpack(G_means), unpack(F_mean), unpack(F_var)

    def loss_fn(self, data_dict, F_samples):
        """Negative ELBO given observed-sample dict (parity: vgpsa.py:491-540).

        Uses the warp/data intermediates stashed by the preceding ``forward``
        call, exactly like the reference's stateful loss.
        """
        if self._last_aux is None:
            raise RuntimeError("loss_fn requires a preceding forward() call")
        hp, warp_aux, data_aux = self._last_aux
        KL = core.kl_divergence(self.spec, hp, warp_aux, data_aux)
        noise_pos = jnp.exp(hp["noise_variance"]) + self.spec.diagonal_offset
        LL = jnp.zeros(())
        for mm, mod in enumerate(self.spec.modalities):
            F = jnp.asarray(F_samples[mod.name])
            Y = jnp.asarray(_as_numpy(data_dict[mod.name]["outputs"]), jnp.float32)
            scale = noise_pos[-self.spec.n_modalities + mm]
            S = F.shape[0]
            log_prob = (
                -0.5 * jnp.square((Y[None] - F) / scale)
                - jnp.log(scale)
                - 0.5 * core._LOG_2PI
            )
            LL = LL + jnp.sum(log_prob) / S
        return -LL + KL

    # ------------------------------------------------------------------
    # Training (the hot loop: one fused XLA graph per step)
    # ------------------------------------------------------------------
    def _loss_fn(self, minibatch_size: Optional[int]):
        """(params, key, S, temp) -> scalar loss, closing over spec/consts/
        batch; the minibatch variant subsamples points on device each call.

        On a distributed model (after ``parallel.distribute``), minibatch
        training routes through the explicit shard_map executor's STRATIFIED
        per-shard sampler: each shard draws B/n_shards points from its own
        local block, so the subsample gather is communication-free — the only
        cross-shard collective in the step is the likelihood/gradient psum.
        (Under plain pjit, ``core.subsample_batch``'s device-wide gather
        forces XLA to insert cross-shard collectives every step.)
        """
        spec, consts, batch = self.spec, self.consts, self._batch
        mesh = getattr(self, "_mesh", None)
        if minibatch_size is not None and mesh is not None:
            from ..parallel.shardmap import _build_shardmap_fn

            # One shard_map program per distinct S, capped: a caller sweeping
            # many S values would otherwise grow this without bound (each
            # entry pins a compiled executable).
            memo = {}

            def loss(params, key, S, temp):
                if S not in memo:
                    if len(memo) >= 4:
                        memo.pop(next(iter(memo)))
                    memo[S] = _build_shardmap_fn(
                        spec, mesh, S, minibatch_size=minibatch_size
                    )
                return memo[S](params, consts, batch, key, jnp.float32(temp))

            return loss
        if minibatch_size is None:
            return lambda params, key, S, temp: core.negative_elbo(
                spec, params, consts, batch, key, S, temp
            )
        sub_spec = core.minibatch_spec(spec, minibatch_size)
        return lambda params, key, S, temp: core.negative_elbo_minibatch(
            spec, sub_spec, params, consts, batch, key, S, temp
        )

    def make_train_step(
        self,
        lr: float = 1e-2,
        S: int = 5,
        optimizer=None,
        minibatch_size: Optional[int] = None,
    ):
        """Returns (step_fn, opt_state). step_fn(params, opt_state, key) ->
        (params, opt_state, loss); jit-compiled, closes over the static spec
        and the packed batch. ``minibatch_size=B`` trains on an unbiased
        B-points-per-view subsample each step (SVI; core.subsample_batch)."""
        tx = optimizer or optax.adam(lr)
        opt_state = tx.init(self.params)
        loss_fn = self._loss_fn(minibatch_size)

        @jax.jit
        def step(params, opt_state, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, key, S, 1.0)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step, opt_state

    def make_train_loop(
        self,
        lr: float = 1e-2,
        S: int = 5,
        optimizer=None,
        minibatch_size: Optional[int] = None,
    ):
        """Scanned multi-step trainer: loop_fn((params, opt_state, key), n)
        runs n fused steps in ONE dispatch (lax.scan) with donated buffers and
        the RNG chain kept on device. ~2-4x throughput over per-step dispatch
        for small configs where launch overhead dominates.

        ``minibatch_size=B`` switches each step to the unbiased B-point
        subsampled ELBO (per-step cost independent of the data size; the full
        padded batch stays device-resident and the gather happens on device).

        Returns (loop_fn, opt_state). loop_fn is jit-cached per distinct n.
        """
        tx = optimizer or optax.adam(lr)
        opt_state = tx.init(self.params)
        loss_fn = self._loss_fn(minibatch_size)

        def one(carry, temp):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, sub, S, temp)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        @partial(jax.jit, donate_argnums=(0,))
        def scan_loop(carry, temps):
            return jax.lax.scan(one, carry, temps)

        def loop(carry, n_or_temps):
            # accepts a step count (temperature 1 = exact ELBO) or a
            # per-step warp-noise temperature array (annealing)
            if isinstance(n_or_temps, (int, np.integer)):
                temps = jnp.ones(int(n_or_temps), jnp.float32)
            else:
                temps = jnp.asarray(n_or_temps, jnp.float32)
            return scan_loop(carry, temps)

        # Stashed so fit() can reuse this loop (and its compiled scans)
        # across calls, rebuilding only the donated-away optimizer state.
        loop._tx = tx
        return loop, opt_state

    def _cached_train_loop(self, lr, S, optimizer, minibatch_size):
        """make_train_loop with reuse across fit() calls.

        A fresh make_train_loop closure means a fresh jax.jit object and a
        full retrace+recompile per fit() call — which dominates wall-clock
        for fit_multistart (one compile per restart). The compiled loop is
        reusable whenever the optimizer object and the training
        configuration are unchanged: spec/batch are fixed for a model
        instance, and reinitialize() only swaps parameter *values*
        (consts are seed-independent, models/params.py). Optimizer state is
        rebuilt every call — the scan donates its carry, so the previous
        opt_state's buffers are gone.
        """
        key = (lr, S, minibatch_size)
        cache = getattr(self, "_train_loop_cache", None)
        if (
            cache is not None
            and cache["key"] == key
            and cache["optimizer"] is optimizer
            # the loop closure captured these objects; anything that replaces
            # them (load(), parallel.distribute(), a changed spec) must miss
            and cache["spec"] is self.spec
            and cache["consts"] is self.consts
            and cache["batch"] is self._batch
        ):
            loop = cache["loop"]
            return loop, loop._tx.init(self.params)
        loop, opt_state = self.make_train_loop(
            lr=lr, S=S, optimizer=optimizer, minibatch_size=minibatch_size
        )
        self._train_loop_cache = {
            "key": key,
            "optimizer": optimizer,
            "loop": loop,
            "spec": self.spec,
            "consts": self.consts,
            "batch": self._batch,
        }
        return loop, opt_state

    def fit(
        self,
        n_epochs: int,
        lr: float = _DEFAULT_LR,
        S: int = 5,
        print_every: Optional[int] = None,
        callback=None,
        convergence_checker=None,
        chunk_size: Optional[int] = None,
        warp_temperature_schedule=None,
        optimizer=None,
        average_last: Optional[int] = None,
        minibatch_size: Optional[int] = None,
        recipe: Optional[str] = None,
        resume_from: Optional[str] = None,
    ) -> np.ndarray:
        """Adam training loop (reference pattern: examples/grid_example.py:59-88).

        Runs in scanned on-device chunks (one dispatch per chunk). Returns the
        loss trace. ``callback(model, epoch, losses)`` fires every
        ``print_every`` epochs (chunk boundaries are aligned to the
        ``print_every`` grid, so no callback epoch is skipped);
        ``convergence_checker(iternum, loss_trace)`` can stop early (checked
        at chunk granularity; see utils.convergence).
        ``warp_temperature_schedule(epoch_array) -> temps`` anneals the
        warp-layer sample noise (None = constant 1.0, the exact ELBO).
        ``average_last=K`` replaces the final parameters with the uniform
        average of chunk-boundary snapshots from the last K epochs (tail /
        Polyak averaging) — it removes the SVI sampling wobble in the
        converged aligned coordinates.
        ``minibatch_size=B`` trains each step on an unbiased B-points-per-view
        subsample (stochastic variational inference); per-step cost becomes
        independent of the total spot count. The returned loss trace holds the
        per-step minibatch estimates.
        ``resume_from=path`` restores params, Adam moments, the RNG carry key
        and the epoch counter from a checkpoint written by ``save()`` after a
        previous ``fit`` and trains ``n_epochs`` MORE epochs — bit-identical
        to never having stopped (same optimizer config required; temperature
        schedules are evaluated at the continued epoch numbers). With
        ``recipe=...`` the schedule horizon is the TOTAL epoch count
        (checkpointed step + n_epochs), so the continuation follows the
        same cosine decay an uninterrupted fit of the total length runs —
        not a fresh schedule restarted past its horizon. Checkpoints whose
        params don't correspond to a live trajectory endpoint
        (fit_multistart winners, ``average_last`` Polyak averages) carry no
        optimizer state and refuse exact resume with a clear error.
        ``recipe="accurate"`` applies the converged-accuracy recipe measured
        in experiments/out/parity_vs_reference.json — Adam under cosine lr
        decay to lr/100 plus the temperature-0 (deterministic-warp)
        objective — unless ``optimizer`` / ``warp_temperature_schedule`` are
        given explicitly. The exact ELBO decouples from view-overlap error
        late in training; this recipe converges alignment monotonically and
        3.5-5.5x below the reference's converged error on the synthetic
        benchmark.
        """
        if self._batch is None:
            raise RuntimeError(
                "this model was loaded from a checkpoint saved with "
                "include_data=False — it can predict but has no training "
                "batch to fit on; call attach_data(data_dict) with the "
                "original data to re-enable training"
            )
        epoch0 = 0
        blob = None
        if resume_from is not None:
            from ..utils.checkpoint import (
                load_checkpoint,
                load_checkpoint_blob,
            )

            # Restore params/consts BEFORE building the train loop: the
            # loop's closure captures self.consts, so loading afterwards
            # would train against the constructor's consts while the model
            # reports the checkpoint's (silent divergence). Keep the
            # existing consts object when values match so the loop cache's
            # identity check survives (as reinitialize() does).
            blob = load_checkpoint_blob(resume_from)
            if not blob["opt"] or blob["rng_key"] is None:
                raise ValueError(
                    f"{resume_from} carries no optimizer state / RNG key; it "
                    "was saved before any fit() or with include_opt=False — "
                    "cannot resume exactly (start a fresh fit instead)"
                )
            self.params, consts = load_checkpoint(
                resume_from, self.params, self.consts
            )
            if not _tree_equal(consts, self.consts):
                self.consts = consts
            epoch0 = int(blob["manifest"].get("step") or 0)
        # Resolve a named recipe over the TOTAL horizon (past + new epochs):
        # on resume the restored optimizer count continues from epoch0, so a
        # schedule built for n_epochs alone would be evaluated past its
        # horizon (e.g. a cosine decay pinned at its floor for the whole
        # continuation). With the total horizon the continuation follows the
        # same schedule a single uninterrupted fit(epoch0 + n_epochs) runs.
        optimizer, warp_temperature_schedule = _resolve_recipe(
            recipe, lr, epoch0 + n_epochs, optimizer,
            warp_temperature_schedule,
            opt_cache=self.__dict__.setdefault("_recipe_opt_cache", {}),
        )
        loop, opt_state = self._cached_train_loop(lr, S, optimizer, minibatch_size)
        if resume_from is not None:
            from ..utils.checkpoint import unflatten_into

            from ..utils.checkpoint import decode_rng_key

            opt_state = unflatten_into(opt_state, blob["opt"])
            carry_key = decode_rng_key(blob)
        else:
            carry_key = self._next_key()
        if chunk_size is None:
            chunk_size = print_every or min(100, max(1, n_epochs))
        if convergence_checker is not None:
            chunk_size = min(chunk_size, 10)
        losses = np.zeros(n_epochs, np.float64)
        carry = (self.params, opt_state, carry_key)
        avg_start = n_epochs - average_last if average_last else n_epochs
        params_sum, n_snapshots = None, 0
        t = 0
        while t < n_epochs:
            n = min(chunk_size, n_epochs - t)
            if print_every:
                # End this chunk on the next print_every boundary so every
                # boundary is a chunk start (callbacks can't be skipped).
                n = min(n, print_every - t % print_every)
            if average_last and t < avg_start:
                n = min(n, avg_start - t)  # first snapshot lands at avg_start
            if warp_temperature_schedule is not None:
                arg = np.asarray(
                    warp_temperature_schedule(np.arange(epoch0 + t, epoch0 + t + n)),
                    np.float32,
                )
            else:
                arg = n
            carry, chunk_losses = loop(carry, arg)
            losses[t : t + n] = np.asarray(chunk_losses, np.float64)
            if print_every and t % print_every == 0:
                print(f"Iter: {t:<10} LL {-losses[t]:1.3e}", flush=True)
                if callback is not None:
                    self.params = carry[0]
                    callback(self, t, losses[: t + n])
            t += n
            if average_last and t > avg_start:
                # Snapshot at the chunk end (new arrays — safe across the
                # donated-buffer boundary of the next loop dispatch).
                if params_sum is None:
                    params_sum = jax.tree.map(lambda a: a + 0, carry[0])
                else:
                    params_sum = jax.tree.map(
                        lambda s, a: s + a, params_sum, carry[0]
                    )
                n_snapshots += 1
            if convergence_checker is not None and convergence_checker(
                t - 1, losses
            ):
                losses = losses[:t]
                break
        if n_snapshots:
            self.params = jax.tree.map(lambda s: s / n_snapshots, params_sum)
            # The Adam moments/RNG belong to the end-of-trajectory params,
            # not the Polyak average — a checkpoint pairing them would
            # silently mis-resume, so save() must write no optimizer state.
            self._opt_state = None
            self._carry_key = None
        else:
            self.params = carry[0]
            # Stash the live training state so save() can write a checkpoint
            # fit(resume_from=...) continues from exactly (Adam moments+RNG).
            self._opt_state = carry[1]
            self._carry_key = carry[2]
        self._epoch = epoch0 + len(losses)
        return losses

    def reinitialize(self, seed: int):
        """Draw a fresh parameter initialization (host-side; same spec)."""
        if self._init_args is None:
            raise RuntimeError(
                "reinitialize() needs the original data_dict; this model was "
                "rebuilt from a checkpoint (VariationalGPSA.load) — call "
                "attach_data(data_dict) first"
            )
        a = self._init_args
        self.params, consts, self.spec = init_params(
            self.spec, a["data_dict"], data_init=a["data_init"],
            grid_init=a["grid_init"], seed=seed,
            fixed_warp_kernel_variances=a["fixed_warp_kernel_variances"],
            fixed_warp_kernel_lengthscales=a["fixed_warp_kernel_lengthscales"],
            fixed_data_kernel_lengthscales=a["fixed_data_kernel_lengthscales"],
        )
        # consts are seed-independent (fixed values / identity constants);
        # keep the existing object when values match so cached train loops
        # (_cached_train_loop) survive restarts instead of recompiling.
        if not _tree_equal(consts, self.consts):
            self.consts = consts
        self._key = make_key(seed)
        return self

    def _holdout_split(self, frac: float, rng: np.random.Generator):
        """Host-side train/holdout split of the original data_dict.

        Drops ``frac`` of each NON-fixed view's spots (the template view is
        never held out — its coords pass through unchanged, so its points
        carry no alignment signal). Returns (train_data_dict, holdout) where
        holdout = {mod: {"X": (n_h, D), "Y": (n_h, P), "counts": [per-view]}}.
        """
        src = self._init_args["data_dict"]
        train, holdout = {}, {}
        for mod in self.spec.modalities:
            X = _as_numpy(src[mod.name]["spatial_coords"]).astype(np.float32)
            Y = _as_numpy(src[mod.name]["outputs"]).astype(np.float32)
            Xt, Yt, Xh, Yh = [], [], [], []
            counts_t, counts_h = [], []
            for v, (lo, hi) in enumerate(view_slices(mod.n_samples)):
                n_v = hi - lo
                if self.spec.fixed_view_mask[v] or n_v < 4:
                    keep = np.arange(n_v)
                    drop = np.zeros(0, np.int64)
                else:
                    n_h = max(1, int(round(frac * n_v)))
                    perm = rng.permutation(n_v)
                    drop, keep = np.sort(perm[:n_h]), np.sort(perm[n_h:])
                Xt.append(X[lo:hi][keep])
                Yt.append(Y[lo:hi][keep])
                Xh.append(X[lo:hi][drop])
                Yh.append(Y[lo:hi][drop])
                counts_t.append(int(keep.size))
                counts_h.append(int(drop.size))
            train[mod.name] = {
                "spatial_coords": np.concatenate(Xt),
                "outputs": np.concatenate(Yt),
                "n_samples_list": counts_t,
            }
            holdout[mod.name] = {
                "X": np.concatenate(Xh),
                "Y": np.concatenate(Yh),
                "counts": counts_h,
            }
        return train, holdout

    def _predictive_score(self, sub_model, holdout) -> float:
        """Mean held-out predictive log-likelihood under the trained model.

        Held-out coords are warped through the restart's warp posterior and
        scored against the data GP's analytic moments (deterministic
        ``predict``); predictive variance adds the learned noise scale
        (reference quirk: exp(noise_variance)+offset IS the scale)."""
        spec = sub_model.spec
        vi = {}
        X_h = {}
        for mod in spec.modalities:
            counts = holdout[mod.name]["counts"]
            cs = np.insert(np.cumsum(counts), 0, 0)
            vi[mod.name] = [
                np.arange(cs[v], cs[v + 1]) for v in range(spec.n_views)
            ]
            X_h[mod.name] = holdout[mod.name]["X"]
        _, F_mean, F_var = sub_model.predict(X_h, vi)
        hp = merge_hyperparams(sub_model.params, sub_model.consts)
        noise_pos = np.exp(np.asarray(hp["noise_variance"])) + spec.diagonal_offset
        total, n = 0.0, 0
        for mm, mod in enumerate(spec.modalities):
            scale = noise_pos[-spec.n_modalities + mm]
            mu = np.asarray(F_mean[mod.name])
            var = np.asarray(F_var[mod.name]) + scale**2
            y = holdout[mod.name]["Y"]
            lp = -0.5 * (y - mu) ** 2 / var - 0.5 * np.log(2.0 * np.pi * var)
            total += float(lp.sum())
            n += lp.size
        return total / max(n, 1)

    def _alignment_consistency(
        self, G_means: dict, k: int = 5, max_points: int = 5000
    ) -> float:
        """Cross-view expression disagreement in aligned coordinates.

        For every ordered view pair (a, b) within each modality, predict
        view a's expression at each of its aligned coordinates by inverse-
        distance-weighted k-NN interpolation of view b's expression (k-d
        tree over view b's aligned coords), and average the squared error.
        A misaligned restart places disagreeing spots next to each other, so
        this tracks the true aligned-view error WITHOUT ground truth —
        measured in experiments/out/restart_selection_ab.json it selects
        the best-possible restart on 4 of 5 difficulty-matched draws and
        near-best on the fifth (median 7.4e-4 == best-possible), where
        tail-loss picks 1.7e-3 and exact S=64 ELBO picks 2.2e-3.

        Views larger than ``max_points`` spots are subsampled (both the
        queried view and the k-d-tree view) with a FIXED seed so every
        restart is scored on the identical spot subset — host kNN over full
        100k+-spot views would otherwise dominate fit_multistart wall-clock
        (measured in experiments/out/multistart_scale_100k.json: selection
        is a few percent of wall-clock under the cap). The score is a mean
        over ~max_points spots, so its restart-ranking power is unchanged.
        """
        from scipy.spatial import cKDTree

        src = self._init_args["data_dict"]
        sub_rng = np.random.default_rng(0)  # fixed: identical across restarts
        errs = []
        for mod in self.spec.modalities:
            Ga = np.asarray(G_means[mod.name], np.float64)
            Y = _as_numpy(src[mod.name]["outputs"]).astype(np.float64)
            idx = [np.arange(lo, hi) for lo, hi in view_slices(mod.n_samples)]
            idx = [
                i if i.size <= max_points
                else np.sort(sub_rng.choice(i, max_points, replace=False))
                for i in idx
            ]
            for a in range(len(idx)):
                for b in range(len(idx)):
                    if a == b or idx[a].size == 0 or idx[b].size < 2:
                        continue
                    kk = min(k, idx[b].size)
                    tree = cKDTree(Ga[idx[b]])
                    d, j = tree.query(Ga[idx[a]], k=kk)
                    d = d.reshape(idx[a].size, kk)
                    j = j.reshape(idx[a].size, kk)
                    w = 1.0 / np.maximum(d, 1e-9)
                    w /= w.sum(axis=1, keepdims=True)
                    yhat = (Y[idx[b]][j] * w[..., None]).sum(axis=1)
                    errs.append(float(np.mean((Y[idx[a]] - yhat) ** 2)))
        return float(np.mean(errs)) if errs else np.inf

    def _commit_params_to_mesh(self):
        """Re-place ``self.params`` into the distributed layout after they
        were replaced wholesale (multistart winners land as restart-mesh or
        host arrays; subsequent distributed training expects the
        param_shardings layout committed by ``parallel.distribute``)."""
        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            return
        from ..parallel.sharding import param_shardings

        sh = param_shardings(self.spec, self.params, mesh)
        self.params = jax.tree.map(jax.device_put, self.params, sh)

    def _warp_init_transforms(self, method: str):
        """Per-view affine seeds ``[(A_T, b) or None per view]`` mapping each
        view's coordinates toward the anchor view's frame, for init-diverse
        multistart (``fit_multistart(init=...)``).

        ``method="prealign"`` uses expression-moment matching
        (utils.prealign.moment_align — the automated analog of the
        reference's hand-tuned rotations, slideseq_prediction.py:110-136);
        ``method="ot"`` runs the entropic-OT + weighted-Procrustes coarse
        alignment (utils.ot.entropic_ot_align_views, the PASTE recipe) and
        recovers each view's rigid map by least squares. Anchor = first
        fixed view, else view 0. Transforms come from the FIRST modality
        (the warp is shared across modalities). Host-side, computed once
        per multistart.
        """
        src = self._init_args["data_dict"]
        mod = self.spec.modalities[0]
        X = _as_numpy(src[mod.name]["spatial_coords"]).astype(np.float64)
        Y = _as_numpy(src[mod.name]["outputs"]).astype(np.float64)
        slices = list(view_slices(mod.n_samples))
        anchor = next(
            (v for v, f in enumerate(self.spec.fixed_view_mask) if f), 0
        )
        D = X.shape[1]
        transforms: list = [None] * self.n_views
        if method == "prealign":
            from ..utils.prealign import moment_align

            Xa, Ya = (X[slice(*slices[anchor])], Y[slice(*slices[anchor])])
            for v, (lo, hi) in enumerate(slices):
                if v == anchor:
                    continue
                A_T, b = moment_align(X[lo:hi], Y[lo:hi], Xa, Ya)
                transforms[v] = (A_T, b)
            return transforms
        if method == "ot":
            from ..utils.ot import entropic_ot_align_views

            idx = [np.arange(lo, hi) for lo, hi in slices]
            # entropic_ot_align_views anchors on view 0; reorder so the
            # template view is the anchor when one is set.
            order = [anchor] + [v for v in range(len(idx)) if v != anchor]
            aligned = entropic_ot_align_views(X, Y, [idx[v] for v in order])
            for v, (lo, hi) in enumerate(slices):
                if v == anchor or hi - lo < D + 1:
                    continue
                H = np.concatenate([X[lo:hi], np.ones((hi - lo, 1))], axis=1)
                sol, *_ = np.linalg.lstsq(H, aligned[lo:hi], rcond=None)
                transforms[v] = (sol[:D], sol[D])
            return transforms
        raise ValueError(f"unknown warp init method {method!r}")

    @staticmethod
    def _apply_warp_seed(params: dict, transforms) -> dict:
        """Seed the warp posterior mean with per-view affine maps: the
        posterior warp value at the inducing points becomes the affinely
        pre-aligned position, ``delta_G[v] = Xtilde[v] @ A_T + b``, instead
        of the identity (delta = Xtilde, params.py init). This starts the
        restart inside a structurally different basin — the lever the
        round-4 tail diagnosis (robustness_tail_diagnosis.json) left
        untried: every random re-seed lands in the same >= 1.3e-3 basin on
        the tail draws."""
        Xt = np.asarray(params["Xtilde"])
        delta = np.array(np.asarray(params["delta_G"]))
        for v, t in enumerate(transforms):
            if t is None:
                continue
            A_T, b = t
            delta[v] = (Xt[v] @ np.asarray(A_T) + np.asarray(b)).astype(
                delta.dtype
            )
        return {**params, "delta_G": jnp.asarray(delta)}

    def _fit_restarts_vectorized(
        self,
        n_epochs: int,
        n_restarts: int,
        seed0: int,
        lr: float = _DEFAULT_LR,
        S: int = 5,
        optimizer=None,
        warp_temperature_schedule=None,
        minibatch_size: Optional[int] = None,
        chunk_size: int = 200,
        init_transforms=None,
    ):
        """Train ``n_restarts`` independent initializations SIMULTANEOUSLY by
        vmapping the restart axis through one scanned train loop.

        Restarts are embarrassingly parallel, and at inducing-point scales
        the single-restart step is latency-bound on TPU (the chip is mostly
        idle between small kernels) — so training R parameter sets per step
        costs far less than R sequential fits. The reference has no
        multistart at all; sequential multistart was this library's round-2
        answer; this is the TPU-native one. Measured at the oracle-harness
        config (200 spots, m=50, 16 restarts x 10k epochs, accurate
        recipe): raw training throughput 2.4x the sequential path (10k
        vmapped epochs in ~59 s vs ~136 s of sequential fits), end-to-end
        fit_multistart 1.31x with a warm compilation cache
        (experiments/out/vectorized_multistart_ab.json; identical winning
        accuracy). CAVEAT: the first-ever compile of an R-wide program on a
        machine is several minutes (vs ~30 s unbatched) — through the
        remote-compile tunnel a cold first multistart can be net slower;
        the compile is persistently cached after that.

        Returns (stacked_params, losses[R, T]). RNG streams are independent
        per restart but differ from the sequential path's (jax.random.split
        of a base key instead of per-restart PRNGKey chains) — restart
        basins are equivalent in distribution, not bit-matched.

        ``init_transforms``: optional per-restart list, each entry None (a
        fresh random init) or a per-view affine-seed list from
        ``_warp_init_transforms`` (applied via ``_apply_warp_seed``).

        On a DISTRIBUTED model (after ``parallel.distribute``) with n > 1
        devices, the restart axis is sharded over a 1-D mesh built from the
        model's own devices — n chips train n restart groups concurrently
        (restarts are embarrassingly parallel, so the program has no
        cross-device collectives; VERDICT r4 item 3). The batch and consts
        are replicated onto every device once at setup; each restart's step
        is then device-local. ``n_restarts`` is padded up to a multiple of
        the device count internally and sliced back before returning.
        """
        a = self._init_args
        if a is None:
            raise RuntimeError(
                "vectorized multistart needs the original data_dict "
                "(unavailable on checkpoint-loaded models)"
            )
        mesh = getattr(self, "_mesh", None)
        n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
        r_total = n_restarts
        if n_dev > 1:
            r_total = -(-n_restarts // n_dev) * n_dev  # pad to device multiple
        stacked = []
        for r in range(r_total):
            p, consts, _ = init_params(
                self.spec, a["data_dict"], data_init=a["data_init"],
                grid_init=a["grid_init"], seed=seed0 + r,
                fixed_warp_kernel_variances=a["fixed_warp_kernel_variances"],
                fixed_warp_kernel_lengthscales=a[
                    "fixed_warp_kernel_lengthscales"
                ],
                fixed_data_kernel_lengthscales=a[
                    "fixed_data_kernel_lengthscales"
                ],
            )
            if r == 0 and not _tree_equal(consts, self.consts):
                raise RuntimeError(
                    "constants changed across reinitialization — vectorized "
                    "multistart assumes seed-independent consts"
                )
            if (
                init_transforms is not None
                and r < len(init_transforms)
                and init_transforms[r] is not None
            ):
                p = self._apply_warp_seed(p, init_transforms[r])
            stacked.append(p)
        params_r = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked)

        tx = optimizer or optax.adam(lr)
        shard_R = None
        if n_dev > 1:
            # Restart-sharded training: bypass self._loss_fn (whose
            # distributed minibatch variant routes through the shard_map
            # executor — a per-restart-LOCAL step is what we want here) and
            # close over batch/consts replicated across the restart mesh.
            from jax.sharding import (
                Mesh,
                NamedSharding,
                PartitionSpec as _P,
            )

            rmesh = Mesh(mesh.devices.reshape(-1), ("restart",))
            shard_R = NamedSharding(rmesh, _P("restart"))
            repl = NamedSharding(rmesh, _P())
            consts_l = jax.tree.map(
                lambda x: jax.device_put(x, repl), self.consts
            )
            batch_l = jax.tree.map(
                lambda x: jax.device_put(x, repl), self._batch
            )
            spec = self.spec
            if minibatch_size is None:
                def loss_fn(params, key, S, temp):
                    return core.negative_elbo(
                        spec, params, consts_l, batch_l, key, S, temp
                    )
            else:
                sub_spec = core.minibatch_spec(spec, minibatch_size)

                def loss_fn(params, key, S, temp):
                    return core.negative_elbo_minibatch(
                        spec, sub_spec, params, consts_l, batch_l, key, S, temp
                    )
        else:
            loss_fn = self._loss_fn(minibatch_size)

        # Memoize the jitted R-wide loop on the instance (single-device
        # path): wave-chunked multistart (fit_multistart(wave_size=w) /
        # adaptive_waves) calls this method once per wave with identical
        # (width, options) — a fresh jax.jit object per call would retrace
        # and re-submit the compile each wave, which through a remote
        # compile tunnel can dominate the run. Mirrors _cached_train_loop's
        # identity guards; the distributed path is not cached (its closure
        # captures per-call device placements).
        ckey = (r_total, S, minibatch_size, None if optimizer else lr)
        cache = getattr(self, "_vec_loop_cache", None)
        if (
            mesh is None
            and cache is not None
            and cache["key"] == ckey
            and cache["optimizer"] is optimizer
            and cache["spec"] is self.spec
            and cache["consts"] is self.consts
            and cache["batch"] is self._batch
        ):
            scan_loop = cache["scan_loop"]
            tx = cache["tx"]
        else:
            vgrad = jax.vmap(
                jax.value_and_grad(loss_fn), in_axes=(0, 0, None, None)
            )

            def one(carry, temp):
                params, opt_state, keys = carry
                split = jax.vmap(jax.random.split)(keys)  # (R, 2, key)
                keys, subs = split[:, 0], split[:, 1]
                loss, grads = vgrad(params, subs, S, temp)
                updates, opt_state = jax.vmap(tx.update)(
                    grads, opt_state, params
                )
                params = jax.vmap(optax.apply_updates)(params, updates)
                return (params, opt_state, keys), loss

            @partial(jax.jit, donate_argnums=(0,))
            def scan_loop(carry, temps):
                return jax.lax.scan(one, carry, temps)

            if mesh is None:
                self._vec_loop_cache = {
                    "key": ckey,
                    "optimizer": optimizer,
                    "spec": self.spec,
                    "consts": self.consts,
                    "batch": self._batch,
                    "scan_loop": scan_loop,
                    "tx": tx,
                }

        keys = jax.random.split(make_key(seed0), r_total)
        if shard_R is not None:
            params_r = jax.tree.map(
                lambda x: jax.device_put(x, shard_R), params_r
            )
            keys = jax.device_put(keys, shard_R)
        opt_state = jax.vmap(tx.init)(params_r)
        if shard_R is not None:
            opt_state = jax.tree.map(
                lambda x: jax.device_put(x, shard_R), opt_state
            )
        carry = (params_r, opt_state, keys)
        losses = np.zeros((n_epochs, r_total), np.float64)
        t = 0
        while t < n_epochs:
            n = min(chunk_size, n_epochs - t)
            if warp_temperature_schedule is not None:
                arg = jnp.asarray(
                    warp_temperature_schedule(np.arange(t, t + n)), jnp.float32
                )
            else:
                arg = jnp.ones(n, jnp.float32)
            carry, chunk_losses = scan_loop(carry, arg)
            losses[t : t + n] = np.asarray(chunk_losses, np.float64)
            t += n
        params_out = carry[0]
        if r_total != n_restarts:
            params_out = jax.tree.map(lambda x: x[:n_restarts], params_out)
            losses = losses[:, :n_restarts]
        return params_out, losses.T  # (R-stacked params pytree, (R, T))

    def fit_multistart(
        self,
        n_epochs: int,
        n_restarts: int = 5,
        seed0: int = 0,
        tail: int = 200,
        verbose: bool = True,
        select: str = "auto",
        holdout_frac: float = 0.1,
        ensemble_top_k: int = 1,
        vectorized: str = "auto",
        adaptive_waves: Optional[int] = None,
        adaptive_rtol: float = 0.05,
        init: str = "random",
        wave_size: Optional[int] = None,
        **fit_kwargs,
    ) -> np.ndarray:
        """Train from ``n_restarts`` independent initializations and keep the
        best restart.

        SVI alignment has initialization-dependent local optima: across
        restarts the converged aligned-view error can span 10x+, and the
        catastrophic runs are visible in the training loss itself (measured
        in experiments/out/accuracy_robustness.json follow-up: the best-tail-
        loss restart reached oracle-level de-novo error on the worst draw).
        The reference offers no equivalent; practitioners restart by hand.

        ``select`` chooses the winner:
          * ``"auto"`` (default) — ``"consistency"`` when the original
            data_dict is available, else ``"loss"`` (checkpoint-loaded
            models don't carry the training outputs).
          * ``"consistency"`` — alignment-correlated selection measured to
            match best-possible restart choice (experiments/out/
            restart_selection_ab.json): every restart trains on the FULL
            data, then is scored by cross-view k-NN expression disagreement
            in its aligned coordinates (``_alignment_consistency``); lowest
            disagreement wins. Scored run == kept run, so the score→outcome
            link is exact.
          * ``"loss"`` — lowest mean training loss over the final ``tail``
            epochs. Cheapest, but the ELBO decouples from view-overlap
            error near convergence (experiments/out/parity_trajectory.json),
            so the best-ELBO restart is not always the best-aligned one
            (median 1.7e-3 vs consistency's 7.4e-4 on the A/B draws).
          * ``"predictive"`` — each restart trains on a split with
            ``holdout_frac`` of every non-template view's spots dropped, is
            scored by held-out predictive log-likelihood through the
            deterministic ``predict()``, and the winning seed is retrained
            on the full data. Measured WORSE than both alternatives (median
            2.4e-3 on the A/B draws): the full-data retrain lands in a
            different basin than the scored 90%-split run, breaking the
            score→outcome link. Kept for the record; prefer "consistency".

        ``ensemble_top_k`` (consistency selection only): when > 1, also
        average the aligned coordinates (G_means) of the ``k`` best-scoring
        restarts and stash the result on ``self.ensemble_G_means_``.
        Restart errors are partly independent displacements, so the
        average matches or beats the single pick (top-2 median 7.2e-4 vs
        7.4e-4 at 8 restarts in restart_selection_ab.json; at 16 restarts
        the oracle harness reaches median 4.0e-4 over 5 difficulty-matched
        draws — below the reference's recorded 5.4e-4 oracle,
        experiments/out/oracle_draw_match.json). The model itself keeps the single winning
        restart's parameters; the ensemble is a post-processing of the
        alignment output.

        ``adaptive_waves`` (consistency selection + vectorized path only):
        instead of training all ``n_restarts`` up front, train them in
        vmapped waves of this size and STOP as soon as a new wave fails to
        improve the best consistency score by more than ``adaptive_rtol``
        (relative). ``n_restarts`` becomes the cap. Restart errors have a
        heavy worst-case tail (accuracy_robustness.json: 1-restart worst
        de-novo 0.082, 3-restart 3.1e-3) and the consistency score is
        measured to track true error, so waves buy tail protection at the
        marginal cost of the vectorized batch — a 4-wide wave costs ~1.2x
        one fit, not 4x. Minimum two waves run (the first has no baseline
        to compare against); selection and ``ensemble_top_k`` then operate
        on every trained restart.

        ``vectorized`` ("auto" default): train all restarts SIMULTANEOUSLY
        by vmapping the restart axis through one scanned train loop
        (``_fit_restarts_vectorized``) — restarts are embarrassingly
        parallel and the single-restart step is latency-bound on TPU at
        inducing-point scales, so this is several times faster than
        sequential fits. "auto" uses it whenever possible (single-device
        model with plain fit options and consistency/loss selection);
        ``False`` forces sequential fits (bit-compatible with earlier
        rounds' RNG streams); ``True`` errors if unsupported.

        ``init`` controls restart-initialization diversity:
          * ``"random"`` (default) — every restart is a fresh random draw
            (prior rounds' behavior).
          * ``"prealign"`` — every restart's warp posterior mean is seeded
            with the coarse affine pre-alignment (expression-moment
            matching, utils.prealign) instead of the identity; other
            parameters still vary by seed.
          * ``"ot"`` — like "prealign" but seeded from the entropic-OT +
            Procrustes coarse alignment (utils.ot, the PASTE recipe).
          * ``"mixed"`` — cycle restarts through {random, prealign, ot}:
            structurally different init families attack different basins
            (the round-4 tail diagnosis showed random re-seeds all land in
            the same >= 1.3e-3 basin on some draws). Selection then picks
            across families.
        Affine seeding writes the warp posterior mean directly, so it is
        unavailable under ``whitened_variational`` (raises).

        ``wave_size`` (vectorized path, non-adaptive): train the restarts
        in fixed vmapped waves of this width instead of one
        ``n_restarts``-wide program — ALL waves still run (no stopping
        rule; use ``adaptive_waves`` for that). This bounds the width of
        the compiled program: an R-wide cold compile through a remote
        compile service grows superlinearly with R and can dominate (or
        stall) the run, while a w-wide program compiles once and is reused
        by every wave. Waves re-run at width ``wave_size`` even for a
        final partial wave (surplus restarts are trained and discarded) so
        a single compiled width serves the whole multistart.

        On a distributed model (``parallel.distribute``), the vectorized
        path shards the restart axis over the model's devices — n chips
        train n restart groups concurrently (``_fit_restarts_vectorized``).

        Accepts every ``fit`` option. Returns the winning run's loss trace
        and leaves the model holding the winning parameters.
        """
        # Resolve a named recipe ONCE so every restart passes the same
        # optimizer object to fit() — the compiled train loop is then reused
        # across restarts (_cached_train_loop) instead of recompiling per
        # restart.
        opt, temps = _resolve_recipe(
            fit_kwargs.pop("recipe", None),
            fit_kwargs.get("lr", _DEFAULT_LR),
            n_epochs,
            fit_kwargs.get("optimizer"),
            fit_kwargs.get("warp_temperature_schedule"),
            opt_cache=self.__dict__.setdefault("_recipe_opt_cache", {}),
        )
        fit_kwargs["optimizer"] = opt
        fit_kwargs["warp_temperature_schedule"] = temps

        if select == "auto":
            select = "consistency" if self._init_args is not None else "loss"
        self.ensemble_G_means_ = None
        self.multistart_winner_ = None

        # Resolve per-restart init families (init-diversity, VERDICT r4
        # item 2). Transforms are computed host-side ONCE per multistart.
        if init not in ("random", "prealign", "ot", "mixed"):
            raise ValueError(f"unknown init {init!r}")
        init_transforms = None
        if init != "random":
            if self._init_args is None:
                raise RuntimeError(
                    f"init={init!r} needs the original data_dict "
                    "(unavailable on checkpoint-loaded models)"
                )
            if self.spec.whitened_variational:
                raise ValueError(
                    "affine-seeded inits write the warp posterior mean "
                    "directly and are not defined under "
                    "whitened_variational"
                )
            seeds = {}
            if init in ("prealign", "mixed"):
                seeds["prealign"] = self._warp_init_transforms("prealign")
            if init in ("ot", "mixed"):
                seeds["ot"] = self._warp_init_transforms("ot")
            if init == "mixed":
                cycle = [None, seeds["prealign"], seeds["ot"]]
                fam_cycle = ["random", "prealign", "ot"]
            else:
                cycle = [seeds[init]]
                fam_cycle = [init]
            init_transforms = [
                cycle[r % len(cycle)] for r in range(n_restarts)
            ]
            init_families = [
                fam_cycle[r % len(fam_cycle)] for r in range(n_restarts)
            ]
        else:
            init_families = ["random"] * n_restarts

        # Vectorized restart training (vmap over the restart axis — see
        # _fit_restarts_vectorized): the default whenever the run is plain
        # enough to batch. Distributed models (vmap-over-pjit layouts) and
        # fit() features the batched loop doesn't implement fall back to
        # sequential fits.
        _VEC_KEYS = {
            "lr", "S", "optimizer", "warp_temperature_schedule",
            "minibatch_size",
        }
        if vectorized not in (True, False, "auto"):
            raise ValueError(f"vectorized must be True/False/'auto', got {vectorized!r}")
        can_vec = (
            self._init_args is not None
            and set(fit_kwargs) <= _VEC_KEYS
            and select in ("consistency", "loss")
        )
        use_vec = vectorized is True or (vectorized == "auto" and can_vec)
        if vectorized is True and not can_vec:
            raise RuntimeError(
                "vectorized=True not supported here ("
                "checkpoint-loaded model, predictive selection, or "
                f"unsupported fit options {set(fit_kwargs) - _VEC_KEYS})"
            )
        if wave_size is not None:
            if wave_size < 1:
                raise ValueError("wave_size must be >= 1")
            if adaptive_waves is not None:
                raise ValueError(
                    "wave_size and adaptive_waves are mutually exclusive: "
                    "adaptive_waves already trains in waves (of its own "
                    "size) and adds the stopping rule"
                )
            if not use_vec:
                raise RuntimeError(
                    "wave_size chunks the vectorized restart path, which "
                    "is unavailable here (distributed/checkpoint-loaded "
                    "model or unsupported fit options)"
                )
        if adaptive_waves is not None:
            if adaptive_waves < 1:
                raise ValueError("adaptive_waves must be >= 1")
            if select != "consistency":
                raise ValueError(
                    "adaptive_waves requires consistency selection "
                    f"(got select={select!r})"
                )
            if not use_vec:
                raise RuntimeError(
                    "adaptive_waves needs the vectorized restart path "
                    "(distributed/checkpoint-loaded models and unsupported "
                    "fit options fall back to sequential training)"
                )

        def _trained_restarts():
            """Yield (r, params_r, losses_r) for every restart."""
            if use_vec:
                # wave_size=None: one n_restarts-wide program. Otherwise
                # fixed-width waves — every wave runs at exactly wave_size
                # (a final partial wave trains surplus restarts and
                # discards them) so ONE compiled width serves all waves.
                w = n_restarts if wave_size is None else min(
                    wave_size, n_restarts
                )
                done = 0
                while done < n_restarts:
                    tr = None
                    if init_transforms is not None:
                        tr = init_transforms[done : done + w]
                        tr = tr + [None] * (w - len(tr))
                    params_R, losses_RT = self._fit_restarts_vectorized(
                        n_epochs, w, seed0 + done,
                        lr=fit_kwargs.get("lr", _DEFAULT_LR),
                        S=fit_kwargs.get("S", 5),
                        optimizer=fit_kwargs["optimizer"],
                        warp_temperature_schedule=fit_kwargs[
                            "warp_temperature_schedule"
                        ],
                        minibatch_size=fit_kwargs.get("minibatch_size"),
                        init_transforms=tr,
                    )
                    for r in range(min(w, n_restarts - done)):
                        yield done + r, \
                            jax.tree.map(lambda x, r=r: x[r], params_R), \
                            losses_RT[r]
                    done += w
            else:
                for r in range(n_restarts):
                    self.reinitialize(seed0 + r)
                    if init_transforms is not None and \
                            init_transforms[r] is not None:
                        self.params = self._apply_warp_seed(
                            self.params, init_transforms[r]
                        )
                    losses = self.fit(n_epochs=n_epochs, **fit_kwargs)
                    yield r, self.params, losses

        if select == "consistency":
            if self._init_args is None:
                raise RuntimeError(
                    "select='consistency' needs the original data_dict "
                    "(unavailable on checkpoint-loaded models); use "
                    "select='loss'"
                )
            src = self._init_args["data_dict"]
            X_by_mod = {
                mod.name: _as_numpy(src[mod.name]["spatial_coords"]).astype(
                    np.float32
                )
                for mod in self.spec.modalities
            }
            vi, Ns, _, _ = self.create_view_idx_dict(src)
            runs = []

            def _score_run(r, params_r, losses):
                self.params = params_r
                G_means, _, _, _ = self.forward(X_by_mod, vi, Ns)
                G_np = {k: np.asarray(v) for k, v in G_means.items()}
                score = self._alignment_consistency(G_np)
                if verbose:
                    print(
                        f"restart {r}: consistency {score:.6f} "
                        f"(tail loss {np.mean(losses[-min(tail, len(losses)):]):.2f})",
                        flush=True,
                    )
                if np.isfinite(score):
                    runs.append((score, r, params_r, losses, G_np))

            if adaptive_waves is not None:
                # Waves of vmapped restarts; stop when a wave fails to improve
                # the best score by more than adaptive_rtol (relative). The
                # first wave has no baseline, so at least two waves run.
                done, best_prev = 0, np.inf
                while done < n_restarts:
                    w = min(adaptive_waves, n_restarts - done)
                    params_R, losses_RT = self._fit_restarts_vectorized(
                        n_epochs, w, seed0 + done,
                        lr=fit_kwargs.get("lr", _DEFAULT_LR),
                        S=fit_kwargs.get("S", 5),
                        optimizer=fit_kwargs["optimizer"],
                        warp_temperature_schedule=fit_kwargs[
                            "warp_temperature_schedule"
                        ],
                        minibatch_size=fit_kwargs.get("minibatch_size"),
                        init_transforms=(
                            None if init_transforms is None
                            else init_transforms[done : done + w]
                        ),
                    )
                    for r in range(w):
                        _score_run(
                            done + r,
                            jax.tree.map(lambda x, r=r: x[r], params_R),
                            losses_RT[r],
                        )
                    done += w
                    best_now = min((t[0] for t in runs), default=np.inf)
                    if done >= n_restarts:
                        break
                    if np.isfinite(best_prev) and (
                        best_now >= best_prev * (1.0 - adaptive_rtol)
                    ):
                        if verbose:
                            print(
                                f"consistency stabilized after {done} "
                                f"restarts (best {best_now:.6f})",
                                flush=True,
                            )
                        break
                    best_prev = best_now
            else:
                for r, params_r, losses in _trained_restarts():
                    _score_run(r, params_r, losses)
            if not runs:
                raise RuntimeError(
                    "fit_multistart: no restart produced a finite "
                    "consistency score"
                )
            runs.sort(key=lambda t: t[0])
            _, best_r, best_params, best_losses, _ = runs[0]
            self.multistart_winner_ = {
                "restart": int(best_r),
                "init_family": init_families[best_r],
                "consistency": float(runs[0][0]),
            }
            if verbose:
                print(
                    f"winner: restart {best_r} "
                    f"(init={init_families[best_r]})",
                    flush=True,
                )
            self.params = best_params
            self._commit_params_to_mesh()
            # The stashed Adam moments/RNG (if any) belong to a different
            # restart's trajectory than the winner — a checkpoint pairing
            # them would silently mis-resume.
            self._opt_state = None
            self._carry_key = None
            if ensemble_top_k > 1:
                top = runs[: min(ensemble_top_k, len(runs))]
                self.ensemble_G_means_ = {
                    mod.name: np.mean(
                        [g[mod.name] for *_, g in top], axis=0
                    )
                    for mod in self.spec.modalities
                }
            return best_losses

        if select == "predictive":
            if self._init_args is None:
                raise RuntimeError(
                    "select='predictive' needs the original data_dict "
                    "(unavailable on checkpoint-loaded models)"
                )
            rng = np.random.default_rng(seed0)
            train_dd, holdout = self._holdout_split(holdout_frac, rng)
            sub = type(self)(train_dd, **self._ctor_kwargs)
            best_seed, best_score = None, -np.inf
            for r in range(n_restarts):
                seed = seed0 + r
                sub.reinitialize(seed)
                sub.fit(n_epochs=n_epochs, **fit_kwargs)
                score = self._predictive_score(sub, holdout)
                if verbose:
                    print(
                        f"restart {r}: held-out predictive ll {score:.4f}",
                        flush=True,
                    )
                if np.isfinite(score) and score > best_score:
                    best_seed, best_score = seed, score
            if best_seed is None:
                raise RuntimeError(
                    "fit_multistart: no restart produced a finite "
                    "held-out predictive likelihood"
                )
            if verbose:
                print(f"winner: seed {best_seed}; retraining on full data", flush=True)
            self.reinitialize(best_seed)
            return self.fit(n_epochs=n_epochs, **fit_kwargs)
        if select != "loss":
            raise ValueError(f"unknown select {select!r}")

        best = None
        for r, params_r, losses in _trained_restarts():
            score = float(np.mean(losses[-min(tail, len(losses)):]))
            if verbose:
                print(f"restart {r}: tail-mean loss {score:.2f}", flush=True)
            if not np.isfinite(score):
                continue  # a diverged (NaN/inf) restart can never win
            if best is None or score < best[0]:
                best = (score, params_r, losses, r)
        if best is None:
            raise RuntimeError(
                "fit_multistart: no restart produced a finite tail-mean loss"
            )
        self.multistart_winner_ = {
            "restart": int(best[3]),
            "init_family": init_families[best[3]],
            "tail_loss": float(best[0]),
        }
        self.params = best[1]
        self._commit_params_to_mesh()
        # See the consistency branch: the stashed optimizer state belongs
        # to a different restart than the winning params.
        self._opt_state = None
        self._carry_key = None
        return best[2]

    def save(
        self,
        path: str,
        step: Optional[int] = None,
        include_data: bool = True,
        include_opt: bool = True,
        extra: Optional[dict] = None,
    ):
        """Self-contained checkpoint to ``path`` (.npz + .json manifest).

        Stores params, frozen hyperparameters, the serialized ``ModelSpec``
        (so ``VariationalGPSA.load(path)`` needs no constructor args),
        and — unless disabled — the packed training batch, the optimizer
        state and the RNG carry key from the last ``fit`` (so
        ``fit(resume_from=path)`` continues training exactly where the
        interrupted run stopped, Adam moments and RNG stream included).
        The reference has no save/restore at all (SURVEY.md §5).
        """
        from ..utils.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            self.params,
            self.consts,
            step=step if step is not None else getattr(self, "_epoch", None),
            extra=extra,
            spec=self.spec,
            batch=self._batch if include_data else None,
            opt_state=getattr(self, "_opt_state", None) if include_opt else None,
            rng_key=getattr(self, "_carry_key", None) if include_opt else None,
        )

    @_hybridmethod
    def load(self_or_cls, path: str):
        """Restore a checkpoint written by ``save``.

        Two forms:
          * ``model.load(path)`` — restore params/consts into an existing
            model (shapes must match; works with any checkpoint version);
          * ``VariationalGPSA.load(path)`` — rebuild a full working model
            from a self-contained checkpoint alone (spec + data embedded;
            no constructor arguments, no original data files).
        """
        from ..utils.checkpoint import (
            load_checkpoint,
            load_checkpoint_blob,
            unflatten_into,
        )

        if not isinstance(self_or_cls, type):
            model = self_or_cls
            model.params, model.consts = load_checkpoint(
                path, model.params, model.consts
            )
            model._restore_training_state(path)
            return model

        cls = self_or_cls
        blob = load_checkpoint_blob(path)
        spec_dict = blob["manifest"].get("spec")
        if spec_dict is None:
            raise ValueError(
                f"{path} is not self-contained (no spec in its manifest); "
                "construct the model and call model.load(path) instead"
            )
        from .spec import spec_from_dict

        spec = spec_from_dict(spec_dict)
        model = cls.__new__(cls)
        model.spec = spec
        # Rebuild nested pytrees from the flat path->array maps. params and
        # consts are (possibly nested) dicts keyed by strings.
        model.params = _nest_flat(blob["params"])
        model.consts = _nest_flat(blob["consts"])
        if blob["data"]:
            batch = _nest_flat(blob["data"])
            model._batch = jax.tree.map(jnp.asarray, batch)
        else:
            model._batch = None
        model._key = make_key(int(blob["manifest"].get("seed", 0)))
        model._last_aux = None
        model._init_args = None  # reinitialize() needs the original data
        model._restore_training_state(path, blob=blob)

        fixed_idxs = [i for i, b in enumerate(spec.fixed_view_mask) if b]
        model.fixed_view_idx = (
            None
            if not fixed_idxs
            else (fixed_idxs[0] if len(fixed_idxs) == 1 else fixed_idxs)
        )
        vi, Ns, Ps, n_total = create_view_idx_dict(spec)
        model.view_idx, model.Ns, model.Ps, model.n_total = vi, Ns, Ps, n_total
        model.n_latent_gps = {
            m.name: (m.n_latent if m.use_lmc else None) for m in spec.modalities
        }
        return model

    def attach_data(
        self,
        data_dict,
        data_init=None,
        grid_init=None,
        fixed_warp_kernel_variances=None,
        fixed_warp_kernel_lengthscales=None,
        fixed_data_kernel_lengthscales=None,
    ):
        """Re-attach training data to a model whose checkpoint was saved
        with ``include_data=False``, re-enabling ``fit`` /
        ``fit_multistart`` / ``neg_elbo`` (such checkpoints otherwise only
        predict — the previously documented gap).

        ``data_dict`` must be the same data layout the checkpoint's spec
        was built from: identical modalities, per-view sample counts,
        spatial dimensionality, and output counts — validated here before
        packing, since ``pack_batch`` pads by the SPEC's counts and would
        otherwise mis-slot plausible-but-wrong data silently. The arrays
        themselves need not be bit-identical to the originals (e.g.
        re-loaded from the source files at a different dtype), but the
        trained parameters are only meaningful against the data they were
        fit on. ``data_init`` / ``grid_init`` restore the optional inducing
        initialization context for ``reinitialize``/multistart."""
        for mod in self.spec.modalities:
            if mod.name not in data_dict:
                raise ValueError(f"data_dict is missing modality {mod.name!r}")
            d = data_dict[mod.name]
            X = _as_numpy(d["spatial_coords"])
            Y = _as_numpy(d["outputs"])
            nsl = [int(n) for n in d["n_samples_list"]]
            if nsl != list(mod.n_samples):
                raise ValueError(
                    f"{mod.name}: n_samples_list {nsl} does not match the "
                    f"checkpoint spec's per-view counts {list(mod.n_samples)}"
                )
            if X.shape != (sum(nsl), self.spec.n_spatial_dims):
                raise ValueError(
                    f"{mod.name}: spatial_coords shape {X.shape} != "
                    f"({sum(nsl)}, {self.spec.n_spatial_dims})"
                )
            if Y.shape != (sum(nsl), mod.n_outputs):
                raise ValueError(
                    f"{mod.name}: outputs shape {Y.shape} != "
                    f"({sum(nsl)}, {mod.n_outputs})"
                )
        for flag, val in (
            ("fixed_warp_kernel_variances", fixed_warp_kernel_variances),
            ("fixed_warp_kernel_lengthscales", fixed_warp_kernel_lengthscales),
            ("fixed_data_kernel_lengthscales", fixed_data_kernel_lengthscales),
        ):
            if getattr(self.spec, flag) and val is None:
                raise ValueError(
                    f"this checkpoint's spec has {flag}=True; pass the "
                    f"original fixed values to attach_data({flag}=...) so "
                    "reinitialize()/multistart rebuild the same model"
                )
        self._batch = pack_batch(self.spec, data_dict)
        self._init_args = {
            "data_dict": data_dict,
            "data_init": data_init,
            "grid_init": grid_init,
            "fixed_warp_kernel_variances": fixed_warp_kernel_variances,
            "fixed_warp_kernel_lengthscales": fixed_warp_kernel_lengthscales,
            "fixed_data_kernel_lengthscales": fixed_data_kernel_lengthscales,
        }
        # Any cached train loop closed over the old (absent) batch.
        self.__dict__.pop("_train_loop_cache", None)
        self.__dict__.pop("_vec_loop_cache", None)
        return self

    def _restore_training_state(self, path: str, blob=None):
        """Pick up the RNG key / epoch counter if the checkpoint has them.

        The optimizer-state arrays are NOT kept on the instance: exact
        resume goes through ``fit(resume_from=path)``, which re-reads the
        checkpoint and unflattens the moments into a freshly-built
        opt-state template (the template's structure depends on the
        optimizer the resuming fit uses, which is unknown here)."""
        from ..utils.checkpoint import load_checkpoint_blob

        if blob is None:
            blob = load_checkpoint_blob(path)
        if blob["rng_key"] is not None:
            from ..utils.checkpoint import decode_rng_key

            self._carry_key = decode_rng_key(blob)
        self._epoch = int(blob["manifest"].get("step") or 0)

    def neg_elbo(self, S: int = 5, key: Optional[jax.Array] = None) -> float:
        """Single fused ELBO evaluation on the training batch."""
        if key is None:
            key = self._next_key()
        return float(
            _jit_neg_elbo(self.spec, self.params, self.consts, self._batch, key, S)
        )


def distance_matrix(X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances between rows of X (n, D) and
    Y (m, D) — returns (m, n). API parity with the reference helper
    (gpsa.py:200-212, defined-but-unused there; kept for completeness)."""
    squared_diffs = jnp.square(jnp.expand_dims(X, 0) - jnp.expand_dims(Y, 1))
    return jnp.sum(squared_diffs, axis=2)


class GPSA(VariationalGPSA):
    """Alias of the working model under the reference's base-class name.

    The reference's ``GPSA`` (gpsa.py:9-197) is an abstract hyperparameter
    holder whose only concrete subclass is ``VariationalGPSA``; a separate
    abstract class would be dead API here, so the name maps to the same
    functional model.
    """
