"""Multi-chip execution: mesh construction + sharding layouts.

The reference is strictly single-process/single-device (SURVEY.md §2.3); the
TPU-native scaling story is jax.sharding over an ICI mesh with XLA-inserted
collectives (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert psums):

  * **data axis** — the spot/point dimension N. Kuf Gram columns
    (vgpsa.py:318,409 analogs) are embarrassingly parallel over points, the
    likelihood is a sum over points (psum), and the m×m Cholesky work is
    small and replicated. This is the axis that matters at real-data scale
    (Slide-seq pucks: 10-50k spots).
  * **model axis** — the latent-GP/output dimension L. The per-latent
    variational covariances (L, m_G, m_G), means (m_G, L) and LMC mixing
    rows (L, P) shard cleanly; the data-layer einsum and KL reduce over L
    with a psum.

Everything is expressed as committed input layouts (device_put with
NamedSharding) + ordinary jit: XLA propagates the shardings through the
fused ELBO graph and inserts the (single) gradient all-reduce.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.spec import ModelSpec
from ..ops import linalg

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """2-D (data, model) mesh over the first n_devices available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_shardings(spec: ModelSpec, mesh: Mesh) -> Dict[str, Dict[str, NamedSharding]]:
    """Point axis sharded over the data axis; requires each modality's
    n_padded to be a multiple of the data-axis size (use the model's
    ``pad_multiple`` constructor arg)."""
    n_data = mesh.shape[DATA_AXIS]
    sh = {}
    for mod in spec.modalities:
        if mod.n_padded % n_data:
            raise ValueError(
                f"modality {mod.name!r}: n_padded={mod.n_padded} not divisible by "
                f"data-axis size {n_data}; construct the model with "
                f"pad_multiple={n_data}"
            )
        sh[mod.name] = {
            "coords": NamedSharding(mesh, P(None, DATA_AXIS, None)),
            "outputs": NamedSharding(mesh, P(None, DATA_AXIS, None)),
            "mask": NamedSharding(mesh, P(None, DATA_AXIS)),
        }
    return sh


def param_shardings(spec: ModelSpec, params: dict, mesh: Mesh) -> dict:
    """Replicate everything except the per-latent-GP data-layer state, which
    shards over the model axis when L divides evenly."""
    n_model = mesh.shape[MODEL_AXIS]
    repl = NamedSharding(mesh, P())
    sh = jax.tree.map(lambda _: repl, params)
    if n_model > 1:
        for mod in spec.modalities:
            if mod.n_latent % n_model == 0:
                sh["Omega_sqt_F"][mod.name] = NamedSharding(mesh, P(MODEL_AXIS, None, None))
                sh["delta_F"][mod.name] = NamedSharding(mesh, P(None, MODEL_AXIS))
                if mod.use_lmc:
                    sh["W"][mod.name] = NamedSharding(mesh, P(MODEL_AXIS, None))
    return sh


def distribute(model, mesh: Mesh):
    """Commit the model's params and packed batch to the mesh layout.

    After this, ``model.make_train_step()`` compiles an SPMD program: XLA
    propagates the committed input shardings and inserts the gradient
    all-reduce over ICI. Returns the model (mutated in place).
    """
    # The fused quad-diag kernel (ops/pallas_quad.py — opt-in only; "auto"
    # already resolves to "xla" after it lost its step A/B) has no
    # custom_partitioning rule, and its xT operand carries the data-sharded
    # point axis — if a user opted a model into "pallas" and then
    # distributed it, the SPMD partitioner would all-gather every shard's
    # points around the kernel. Per-model spec edit, same pattern as
    # merged_factor_dispatch below (never a process global).
    model.spec = dataclasses.replace(model.spec, quad_diag_impl="xla")
    n_model = mesh.shape[MODEL_AXIS]
    if n_model > 1 and any(
        mod.n_latent % n_model == 0 for mod in model.spec.modalities
    ):
        # The variational state shards over the model axis: disable the
        # merged factorization/KL dispatches — a single batched op whose
        # lanes mix replicated and model-sharded state makes the SPMD
        # partitioner leak NaN into zero-weight lanes' gradients and would
        # force per-step reshard collectives (spec.merged_factor_dispatch).
        model.spec = dataclasses.replace(model.spec, merged_factor_dispatch=False)
        # The Pallas Cholesky stays usable here: ops.pallas_cholesky wraps
        # the kernel in custom_partitioning (batch lanes are independent, so
        # batch-dim sharding runs the kernel per shard with no collectives —
        # HLO-asserted in tests/test_sharding.py), so model-sharded Omega
        # slabs keep the fused kernel under spec.cholesky_impl="auto".
    p_sh = param_shardings(model.spec, model.params, mesh)
    b_sh = batch_shardings(model.spec, mesh)
    model.params = jax.tree.map(jax.device_put, model.params, p_sh)
    model.consts = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), model.consts
    )
    model._batch = jax.tree.map(jax.device_put, model._batch, b_sh)
    model._mesh = mesh
    return model
