"""Parameter-pytree checkpointing.

The reference has no checkpoint/resume at all (SURVEY.md §5: no torch.save
anywhere; mid-training CSV dumps only). Here: flat .npz of the params/consts
pytrees + a JSON manifest — dependency-free, safe (no pickle), and
restart-friendly for long real-data runs.

Self-contained checkpoints (round 3): the manifest embeds the serialized
``ModelSpec`` and the npz can carry the packed training batch, the optimizer
state and the training RNG key, so ``VariationalGPSA.load(path)`` rebuilds a
working model with no constructor arguments and ``fit(resume_from=path)``
continues training bit-exactly (same Adam moments, same RNG stream).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import jax


def _flatten_with_paths(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: dict):
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = flat[key]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != model {np.asarray(leaf).shape}"
            )
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str,
    params,
    consts=None,
    step: Optional[int] = None,
    extra: Optional[dict] = None,
    spec=None,
    batch=None,
    opt_state=None,
    rng_key=None,
):
    """Write params (+consts) to ``path`` (.npz) with a sibling .json manifest.

    Optional sections for a fully self-contained checkpoint:
      * ``spec`` — a ModelSpec, serialized into the manifest (JSON);
      * ``batch`` — the packed training batch pytree (npz ``data/`` section);
      * ``opt_state`` — an optax state pytree (npz ``opt/`` section; restored
        against a fresh ``tx.init(params)`` template on resume);
      * ``rng_key`` — the training-loop carry key (npz ``rng/key``).
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = {f"params/{k}": v for k, v in _flatten_with_paths(params).items()}
    if consts is not None:
        payload.update({f"consts/{k}": v for k, v in _flatten_with_paths(consts).items()})
    if batch is not None:
        payload.update({f"data/{k}": v for k, v in _flatten_with_paths(batch).items()})
    if opt_state is not None:
        payload.update({f"opt/{k}": v for k, v in _flatten_with_paths(opt_state).items()})
    rng_impl = None
    if rng_key is not None:
        import jax.numpy as jnp

        if jnp.issubdtype(jnp.asarray(rng_key).dtype, jax.dtypes.prng_key):
            # Typed PRNG key: store raw key data + the impl name in the
            # manifest so restore rebuilds the same generator (the library
            # defaults to rbg keys on TPU; raw arrays would lose the impl).
            rng_impl = str(jax.random.key_impl(rng_key))
            payload["rng/key"] = np.asarray(jax.random.key_data(rng_key))
        else:
            payload["rng/key"] = np.asarray(rng_key)
    np.savez(path, **payload)
    manifest = {"step": step, "n_leaves": len(payload)}
    if rng_impl is not None:
        manifest["rng_impl"] = rng_impl
    if spec is not None:
        from ..models.spec import spec_to_dict

        manifest["spec"] = spec_to_dict(spec)
    if extra:
        manifest.update(extra)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def read_manifest(path: str) -> dict:
    """The sibling .json manifest ({} if absent — pre-round-3 checkpoints)."""
    mpath = _npz_path(path) + ".json"
    if not os.path.exists(mpath):
        return {}
    with open(mpath) as f:
        return json.load(f)


def load_checkpoint_blob(path: str) -> dict:
    """Raw checkpoint contents without templates.

    Returns {"params": flat, "consts": flat, "data": flat, "opt": flat,
    "rng_key": array|None, "manifest": dict} where each flat dict maps
    slash-joined pytree paths to numpy arrays.
    """
    sections = {"params": {}, "consts": {}, "data": {}, "opt": {}}
    rng_key = None
    with np.load(_npz_path(path)) as data:
        for k in data.files:
            if k == "rng/key":
                rng_key = np.asarray(data[k])
                continue
            sec, _, rest = k.partition("/")
            if sec in sections:
                sections[sec][rest] = data[k]
    sections["rng_key"] = rng_key
    sections["manifest"] = read_manifest(path)
    return sections


def decode_rng_key(blob: dict):
    """The training-loop carry key from a checkpoint blob: a typed key when
    the manifest records its impl (rng_impl), else the legacy raw uint32
    array (interpreted under jax's global default impl)."""
    import jax.numpy as jnp

    if blob["rng_key"] is None:
        return None
    impl = blob["manifest"].get("rng_impl")
    arr = jnp.asarray(blob["rng_key"])
    if impl:
        return jax.random.wrap_key_data(arr, impl=impl)
    return arr


def unflatten_into(template, flat: dict):
    """Public wrapper: rebuild a pytree shaped like ``template`` from a flat
    path->array dict (shape-checked)."""
    return jax.tree.map(
        lambda x: jax.numpy.asarray(x), _unflatten_like(template, flat)
    )


def load_checkpoint(path: str, params_template, consts_template=None) -> Tuple:
    """Restore (params[, consts]) pytrees matching the given templates."""
    with np.load(_npz_path(path)) as data:
        flat_p = {k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")}
        flat_c = {k[len("consts/"):]: data[k] for k in data.files if k.startswith("consts/")}
    params = unflatten_into(params_template, flat_p)
    if consts_template is None:
        return params
    consts = unflatten_into(consts_template, flat_c)
    return params, consts
