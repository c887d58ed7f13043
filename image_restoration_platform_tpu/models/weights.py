"""Compact weight files: flat path->array npz for serving checkpoints.

Training uses orbax for resumable checkpoints (train/trainer.py); serving
loads a single .npz per family (small, git-friendly, no directory trees).
Param trees are flattened with '/'-joined key paths; arrays are stored bf16
for conv/dense kernels and f32 for norms/biases (the engine casts to its
compute dtype at call time anyway).
"""

from __future__ import annotations

import io
import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for key, value in tree.items():
            out.update(_flatten(value, f"{prefix}{key}/"))
    elif isinstance(tree, (list, tuple)):
        for i, value in enumerate(tree):
            out.update(_flatten(value, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _set_path(tree, path, value):
    keys = path.split("/")
    node = tree
    for key in keys[:-1]:
        node = node[int(key)] if isinstance(node, (list, tuple)) else node[key]
    last = keys[-1]
    if isinstance(node, (list, tuple)):
        node[int(last)] = value
    else:
        node[last] = value


def save_params(params, path: str, half_precision: bool = True) -> None:
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))
    if half_precision:
        flat = {
            k: v.astype(np.float16) if v.dtype == np.float32 and v.ndim >= 2 else v
            for k, v in flat.items()
        }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    buf = io.BytesIO()
    np.savez_compressed(buf, **flat)
    # atomic swap: interim exports (TRAIN_EXPORT_EVERY) overwrite the served
    # weights mid-run; a kill during a plain open(path,'wb') write would
    # corrupt both the serving weights and the TRAIN_RESUME warm-start source
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_params(template, path: str):
    """Load an npz into the structure of ``template`` (from family.init)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    # deep-copy template structure with loaded values
    result = jax.tree_util.tree_map(lambda x: x, template)
    for key, value in flat.items():
        ref = _lookup(template, key)
        _set_path(result, key, value.astype(np.asarray(ref).dtype))
    return result


def _lookup(tree, path):
    node = tree
    for key in path.split("/"):
        node = node[int(key)] if isinstance(node, (list, tuple)) else node[key]
    return node


def default_weights_dir() -> str:
    return os.environ.get(
        "IRP_WEIGHTS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "weights"),
    )


def weights_path(family_name: str) -> str:
    return os.path.join(default_weights_dir(), f"{family_name}.npz")
