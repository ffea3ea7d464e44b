"""Checkpoint IO for pytree train state.

Functional analogue of the reference ``CheckpointIO``
(``/root/reference/model/checkpoints.py:9-131``): saves params + both Adam
states + scalar kwargs (epoch_it, it, depth_range) to both a "latest" file and
a per-epoch history directory; load restores the scalars. Storage is a flat
npz of '/'-joined pytree paths — no torch dependency on the hot path. Full
reference ``model.pt`` checkpoints can be ingested via
``copenerf_tpu.models.torch_io.load_reference_renderer_checkpoint``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
        out[f"{prefix}__len__"] = np.asarray(len(tree))
        if isinstance(tree, tuple):
            out[f"{prefix}__tuple__"] = np.asarray(1)
    elif tree is None:
        out[f"{prefix}__none__"] = np.asarray(1)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    # Build a nested dict first, then convert #i / __len__ markers to lists.
    root = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def convert(node):
        if not isinstance(node, dict):
            return node
        if "__none__" in node:
            return None
        if "__len__" in node:
            n = int(node["__len__"])
            seq = [convert(node[f"#{i}"]) for i in range(n)]
            return tuple(seq) if "__tuple__" in node else seq
        return {k: convert(v) for k, v in node.items()}

    return convert(root)


def save_checkpoint(out_dir: str, state: dict, scalars: dict,
                    latest: bool = True, epoch: int | None = None):
    """Write state to ``<out_dir>/models/weights[/_{epoch}]/model.ckpt``."""
    sub = "weights" if latest else f"weights_{epoch}"
    path = os.path.join(out_dir, "models", sub)
    os.makedirs(path, exist_ok=True)
    flat = _flatten(jax.device_get(state))
    np.savez(os.path.join(path, "model.ckpt.npz"), **flat)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(scalars, f)
    return os.path.join(path, "model.ckpt.npz")


def load_checkpoint(out_dir: str, sub: str = "weights",
                    model_only: bool = False):
    """Load (state, scalars); raises FileNotFoundError when absent (the
    reference raises FileExistsError to signal fresh start, :60-66)."""
    path = os.path.join(out_dir, "models", sub)
    ckpt = os.path.join(path, "model.ckpt.npz")
    if not os.path.isfile(ckpt):
        raise FileNotFoundError(ckpt)
    with np.load(ckpt) as blob:
        flat = {k: blob[k] for k in blob.files}
    state = _unflatten(flat)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    scalars = {}
    meta = os.path.join(path, "meta.json")
    if os.path.isfile(meta) and not model_only:
        with open(meta) as f:
            scalars = json.load(f)
    return state, scalars


def load_url(url: str, cache_dir: str | None = None):
    """Fetch a checkpoint from a URL into a local cache and load it
    (reference ``CheckpointIO.load`` dispatches http(s) paths to
    ``load_url``, model/checkpoints.py:60-77)."""
    import hashlib
    import urllib.request

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "copenerf_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    local = os.path.join(
        cache_dir, hashlib.sha256(url.encode()).hexdigest()[:16] + ".npz")
    if not os.path.isfile(local):
        urllib.request.urlretrieve(url, local)
    return load_pytree(local)


def save_pytree(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **_flatten(jax.device_get(tree)))


def load_pytree(path: str):
    with np.load(path) as blob:
        flat = {k: blob[k] for k in blob.files}
    return jax.tree_util.tree_map(jnp.asarray, _unflatten(flat))
