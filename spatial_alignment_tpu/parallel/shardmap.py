"""Explicit-collective ELBO executor built on jax.shard_map.

Complement to the committed-layout pjit path (sharding.py, where XLA infers
the collectives): here the SPMD program is written explicitly — each shard
owns a slice of the point axis, computes its local likelihood contribution,
and a ``psum`` over the data axis produces the global ELBO. KL terms depend
only on (replicated) parameters and are computed identically on every shard.

Exactness design: every shard draws the FULL (S, V, N, D) / (S, N, L) noise
tensors from the same key and slices its local block, so the psum'd ELBO is
bit-identical to the single-device program — verified in
tests/test_sharding.py. The redundant noise generation is a few hundred KB
per shard, noise next to the Gram work.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import core
from ..models.spec import ModelSpec
from .sharding import DATA_AXIS

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _local_spec(spec: ModelSpec, n_shards: int) -> ModelSpec:
    """Spec whose per-view padded sizes are the per-shard slice sizes."""
    mods = []
    for m in spec.modalities:
        if m.n_padded % n_shards:
            raise ValueError(
                f"modality {m.name!r}: n_padded={m.n_padded} not divisible by "
                f"{n_shards} shards; construct the model with pad_multiple={n_shards}"
            )
        mods.append(dataclasses.replace(m, n_padded=m.n_padded // n_shards))
    return spec.replace(modalities=tuple(mods))


def make_shardmap_neg_elbo(
    spec: ModelSpec, mesh: Mesh, consts: dict, S: int, minibatch_size=None
):
    """Returns neg_elbo(params, batch, key) -> scalar, executed SPMD over the
    mesh's data axis with explicit psum of the likelihood.

    ``minibatch_size=B`` (global, divisible by the data-axis size) switches to
    stratified minibatch SVI: each shard draws B/n_shards points from its own
    local block — unbiased like the single-device ``core.subsample_batch``
    (stratification can only reduce estimator variance), with zero cross-shard
    communication for the gather."""
    fn = _build_shardmap_fn(spec, mesh, S, minibatch_size=minibatch_size)

    @jax.jit
    def neg_elbo(params, batch, key):
        return fn(params, consts, batch, key, jnp.float32(1.0))

    return neg_elbo


def make_shardmap_train_step(
    spec: ModelSpec,
    mesh: Mesh,
    consts: dict,
    S: int,
    lr: float = 1e-2,
    optimizer=None,
    minibatch_size=None,
):
    """Full training step through the explicit-collective executor.

    Differentiates the shard_map ELBO (the psum's reverse is a broadcast, so
    replicated parameter gradients come out exact) and applies an optax
    update. Returns ``(step, init)`` where ``step(params, opt_state, batch,
    key) -> (params, opt_state, loss)`` and ``init(params) -> opt_state``.
    ``minibatch_size``: see ``make_shardmap_neg_elbo``.
    """
    import optax

    fn = _build_shardmap_fn(spec, mesh, S, minibatch_size=minibatch_size)
    tx = optimizer or optax.adam(lr)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: fn(p, consts, batch, key, jnp.float32(1.0))
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, tx.init


def _local_minibatch(lspec: ModelSpec, mb_lspec: ModelSpec, batch, key):
    """Stratified subsample of this shard's local point block.

    Real points occupy a contiguous prefix of every local slice (global
    prefix-padded layout split contiguously), so drawing
    ``floor(u * count)`` with the local real count (from the mask) samples
    uniformly over real points only. The returned masks carry
    ``count_v / b`` weights; summed over shards via the likelihood psum this
    is the stratified unbiased estimator of the full-data likelihood. Shards
    with an all-padding slice get weight 0 (their gathered garbage is
    multiplied out of the sum)."""
    sub = {}
    keys = jax.random.split(key, len(lspec.modalities))
    for kk, m_local, m_mb in zip(keys, lspec.modalities, mb_lspec.modalities):
        b = m_mb.n_padded
        bb = batch[m_local.name]
        mask = bb["mask"]  # (V, Np_local)
        count = jnp.sum(mask, axis=1)  # (V,) real points in this shard
        u = jax.random.uniform(kk, (mask.shape[0], b))
        idx = jnp.minimum(
            jnp.floor(u * count[:, None]), jnp.maximum(count[:, None] - 1.0, 0.0)
        ).astype(jnp.int32)
        coords = jnp.take_along_axis(bb["coords"], idx[..., None], axis=1)
        outputs = jnp.take_along_axis(bb["outputs"], idx[..., None], axis=1)
        w = count[:, None] / b
        sub[m_local.name] = {
            "coords": coords,
            "outputs": outputs,
            "mask": jnp.broadcast_to(w, (mask.shape[0], b)),
        }
    return sub


def _build_shardmap_fn(spec: ModelSpec, mesh: Mesh, S: int, minibatch_size=None):
    """The raw (unjitted) shard_map SPMD function shared by the ELBO and
    train-step entry points."""
    n_shards = mesh.shape[DATA_AXIS]
    lspec = _local_spec(spec, n_shards)
    if minibatch_size is not None:
        if minibatch_size % n_shards:
            raise ValueError(
                f"minibatch_size={minibatch_size} not divisible by the "
                f"data-axis size {n_shards}"
            )
        mb_lspec = core.minibatch_spec(lspec, minibatch_size // n_shards)

        def local_fn_mb(params, consts, batch, key, temp):
            # No single-device bit-parity claim in minibatch mode (index draws
            # are per-shard by construction): each shard folds its axis index
            # into the key and draws local-shaped noise directly. The psum'd
            # estimate is unbiased for the full-batch ELBO.
            shard = jax.lax.axis_index(DATA_AXIS)
            hp = dict(consts)
            hp.update(params)
            k_idx, k_warp, k_data = jax.random.split(
                jax.random.fold_in(key, shard), 3
            )
            with jax.default_matmul_precision("highest"):
                sub = _local_minibatch(lspec, mb_lspec, batch, k_idx)
                X_all, _ = core._concat_modalities(mb_lspec, sub)
                G_mean, G_samp, warp_aux = core.warp_layer(
                    mb_lspec, hp, X_all, k_warp, S, temperature=temp
                )
                G_samples = core._split_modalities(mb_lspec, G_samp, axis=2)
                F_latent, F_obs, data_aux = core.data_layer(
                    mb_lspec, hp, G_samples, k_data
                )
                noise_pos = jnp.exp(hp["noise_variance"]) + spec.diagonal_offset
                LL_local = jnp.zeros(())
                for mm, mod in enumerate(mb_lspec.modalities):
                    scale = noise_pos[-spec.n_modalities + mm]
                    LL_local = LL_local + (
                        core.gaussian_loglik_sum(
                            sub[mod.name]["outputs"],
                            F_obs[mod.name],
                            scale,
                            sub[mod.name]["mask"],
                        )
                        / S
                    )
                LL = jax.lax.psum(LL_local, DATA_AXIS)
                KL = core.kl_divergence(mb_lspec, hp, warp_aux, data_aux)
                return -LL + KL

        return _wrap_shardmap(spec, mesh, local_fn_mb)

    def local_fn(params, consts, batch, key, temp):
        idx = jax.lax.axis_index(DATA_AXIS)
        hp = dict(consts)
        hp.update(params)
        k_warp, k_data = jax.random.split(key, 2)

        with jax.default_matmul_precision("highest"):
            # Full noise tensors, sliced to this shard's point block — keeps
            # every shard's draws identical to the single-device program.
            X_all_local, _ = core._concat_modalities(lspec, batch)
            V, n_tot_local, D = X_all_local.shape
            # warp noise is drawn per modality block to mirror the global
            # concat layout: global Ntot = sum over modalities of n_padded
            w_noise_parts = []
            off_global = 0
            off_check = 0
            full_shapes = [(m.n_padded, m.n_latent) for m in spec.modalities]
            full_ntot = sum(m.n_padded for m in spec.modalities)
            w_full = jax.random.normal(
                k_warp, (S, V, full_ntot, D), X_all_local.dtype
            )
            for m_full, m_local in zip(spec.modalities, lspec.modalities):
                start = off_global + idx * m_local.n_padded
                w_noise_parts.append(
                    jax.lax.dynamic_slice_in_dim(w_full, start, m_local.n_padded, axis=2)
                )
                off_global += m_full.n_padded
            w_noise = jnp.concatenate(w_noise_parts, axis=2)

            G_mean, G_samp, warp_aux = core.warp_layer(
                lspec, hp, X_all_local, k_warp, S, temperature=temp, noise=w_noise
            )
            G_samples = core._split_modalities(lspec, G_samp, axis=2)

            keys_f = jax.random.split(k_data, spec.n_modalities)
            f_noise = {}
            for kk, m_full, m_local in zip(keys_f, spec.modalities, lspec.modalities):
                full = jax.random.normal(
                    kk, (S, spec.n_views * m_full.n_padded, m_full.n_latent)
                )
                full = full.reshape(S, spec.n_views, m_full.n_padded, m_full.n_latent)
                loc = jax.lax.dynamic_slice_in_dim(
                    full, idx * m_local.n_padded, m_local.n_padded, axis=2
                )
                f_noise[m_full.name] = loc.reshape(
                    S, spec.n_views * m_local.n_padded, m_full.n_latent
                )

            F_latent, F_obs, data_aux = core.data_layer(
                lspec, hp, G_samples, k_data, noise=f_noise
            )

            # local masked likelihood, reduced over the data axis
            noise_pos = jnp.exp(hp["noise_variance"]) + spec.diagonal_offset
            LL_local = jnp.zeros(())
            for mm, mod in enumerate(lspec.modalities):
                scale = noise_pos[-spec.n_modalities + mm]
                LL_local = LL_local + (
                    core.gaussian_loglik_sum(
                        batch[mod.name]["outputs"],
                        F_obs[mod.name],
                        scale,
                        batch[mod.name]["mask"],
                    )
                    / S
                )
            LL = jax.lax.psum(LL_local, DATA_AXIS)

            # KL depends only on replicated params — identical on all shards
            KL = core.kl_divergence(lspec, hp, warp_aux, data_aux)
            return -LL + KL

    return _wrap_shardmap(spec, mesh, local_fn)


def _wrap_shardmap(spec: ModelSpec, mesh: Mesh, local_fn):
    batch_specs = {
        m.name: {
            "coords": P(None, DATA_AXIS, None),
            "outputs": P(None, DATA_AXIS, None),
            "mask": P(None, DATA_AXIS),
        }
        for m in spec.modalities
    }
    return shard_map(
        partial(local_fn),
        mesh=mesh,
        in_specs=(P(), P(), batch_specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
