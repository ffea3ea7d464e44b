"""Ingest PyTorch checkpoints from the reference implementation.

Supports:
  * the pretrained SDF warm start (``pretrained_sdf/model.pt``, loaded by the
    reference at ``train.py:41-43``) — weight-normed ``lin{l}.weight_g/_v``;
  * full reference renderer checkpoints saved by ``model/checkpoints.py:29-46``
    (keys ``model.module.<net>.<layer>.*``), enabling migration of trained
    reference models into this framework.

Torch stores linear weights as (out, in); we store (in, out) — a transpose.
``weight_g`` is (out, 1) -> our ``g`` is (out,).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _to_np(t):
    import torch  # local import: torch is only needed for ingestion

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy().astype(np.float32)
    return np.asarray(t, np.float32)


def _convert_linear(sd: dict, prefix: str) -> dict:
    if f"{prefix}.weight_v" in sd:
        return {
            "v": jnp.asarray(_to_np(sd[f"{prefix}.weight_v"]).T),
            "g": jnp.asarray(_to_np(sd[f"{prefix}.weight_g"]).reshape(-1)),
            "b": jnp.asarray(_to_np(sd[f"{prefix}.bias"])),
        }
    return {
        "w": jnp.asarray(_to_np(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(_to_np(sd[f"{prefix}.bias"])),
    }


def _strip_prefix(sd: dict, prefix: str) -> dict:
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if not out:
        raise KeyError(f"no keys with prefix {prefix!r}")
    return out


def idr_mlp_from_torch(sd: dict, n_linears: int) -> dict:
    """Convert an IDR-style MLP state dict (lin0..lin{n-1}) to a pytree."""
    return {f"lin{l}": _convert_linear(sd, f"lin{l}") for l in range(n_linears)}


def sdf_params_from_torch(sd: dict, n_layers: int = 8) -> dict:
    return idr_mlp_from_torch(sd, n_layers + 1)


def motion_params_from_torch(sd: dict, n_layers: int = 4) -> dict:
    return idr_mlp_from_torch(sd, n_layers + 1)


def color_params_from_torch(sd: dict, n_layers: int = 4) -> dict:
    return idr_mlp_from_torch(sd, n_layers + 1)


def variance_params_from_torch(sd: dict) -> dict:
    return {"variance": jnp.asarray(_to_np(sd["variance"]).reshape(()))}


def nerf_params_from_torch(sd: dict, depth: int = 8) -> dict:
    params = {}
    for i in range(depth):
        params[f"pts{i}"] = _convert_linear(sd, f"pts_linears.{i}")
    params["views0"] = _convert_linear(sd, "views_linears.0")
    params["feature"] = _convert_linear(sd, "feature_linear")
    params["alpha"] = _convert_linear(sd, "alpha_linear")
    params["rgb"] = _convert_linear(sd, "rgb_linear")
    return params


def load_pretrained_sdf(path: str, n_layers: int = 8) -> dict:
    """Load the reference's pretrained SDF warm-start checkpoint."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sdf_params_from_torch(sd, n_layers)


def load_reference_renderer_checkpoint(path: str) -> dict:
    """Load a full reference training checkpoint into our params pytree.

    The reference saves ``{"model": DataParallel(NeuSRenderer).state_dict(),
    ...scalars}``; renderer submodules are ``module.sdf_network`` /
    ``deviation_network`` / ``color_network`` / ``motion_network`` / ``nerf``.
    Returns ``{"params": {...}, "scalars": {epoch_it, it, ...}}``.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob["model"] if "model" in blob else blob
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    params = {
        "sdf": sdf_params_from_torch(_strip_prefix(sd, "sdf_network.")),
        "color": color_params_from_torch(_strip_prefix(sd, "color_network.")),
        "motion": motion_params_from_torch(_strip_prefix(sd, "motion_network.")),
        "variance": variance_params_from_torch(
            _strip_prefix(sd, "deviation_network.")),
        "nerf": nerf_params_from_torch(_strip_prefix(sd, "nerf.")),
    }
    scalars = {k: v for k, v in blob.items()
               if not hasattr(v, "keys") and np.isscalar(v)}
    return {"params": params, "scalars": scalars}
