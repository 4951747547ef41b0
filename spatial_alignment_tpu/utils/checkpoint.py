"""Parameter-pytree checkpointing.

The reference has no checkpoint/resume at all (SURVEY.md §5: no torch.save
anywhere; mid-training CSV dumps only). Here: flat .npz of the params/consts
pytrees + a JSON manifest — dependency-free, safe (no pickle), and
restart-friendly for long real-data runs.
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


def save_checkpoint(path: str, params, consts=None, step: Optional[int] = None, extra: Optional[dict] = None):
    """Write params (+consts) to ``path`` (.npz) with a sibling .json manifest."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    payload = {f"params/{k}": v for k, v in _flatten_with_paths(params).items()}
    if consts is not None:
        payload.update({f"consts/{k}": v for k, v in _flatten_with_paths(consts).items()})
    np.savez(path, **payload)
    manifest = {"step": step, "n_leaves": len(payload)}
    if extra:
        manifest.update(extra)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)


def load_checkpoint(path: str, params_template, consts_template=None) -> Tuple:
    """Restore (params[, consts]) pytrees matching the given templates."""
    with np.load(path if path.endswith(".npz") else path + ".npz") as data:
        flat_p = {k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")}
        flat_c = {k[len("consts/"):]: data[k] for k in data.files if k.startswith("consts/")}
    params = jax.tree.map(
        lambda x: jax.numpy.asarray(x), _unflatten_like(params_template, flat_p)
    )
    if consts_template is None:
        return params
    consts = jax.tree.map(
        lambda x: jax.numpy.asarray(x), _unflatten_like(consts_template, flat_c)
    )
    return params, consts
