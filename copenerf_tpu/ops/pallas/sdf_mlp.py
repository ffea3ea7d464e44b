"""Fused positional-encoding + weight-norm MLP forward as a Pallas TPU kernel.

Used for the gradient-free SDF sweeps of hierarchical importance sampling
(the reference runs these under ``torch.no_grad``,
``model/neus_renderer.py:493-499``) and for eval-time field queries. Fusing
the 9-layer MLP into one kernel keeps every activation in VMEM — the XLA
default streams ~(N, 256) f32 activations through HBM between layers, which
is bandwidth-bound at NeRF batch sizes.

The kernel takes *effective* weights (weight-norm already materialized by the
caller — a negligible (in, out) normalization) so the VMEM working set is
weights (~2.1 MB for the default SDF net) + one row tile of activations.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ...models.embedder import embed_dim
from ...models.mlp import effective_weight

DEFAULT_TILE = 512


def _pe_rows(x, multires: int):
    """Positional encoding inside the kernel; layout matches
    models/embedder.py (freq-major, sin before cos)."""
    if multires <= 0:
        return x
    parts = [x]
    for k in range(multires):
        f = float(2.0 ** k)
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


def _softplus100(x):
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


def build_sdf_value_kernel(cfg, tile: int = DEFAULT_TILE,
                           interpret: bool = False):
    """Return ``fn(params, pts_time (N, 4)) -> sdf (N,)`` running the fused
    Pallas kernel (N must be padded to a multiple of ``tile`` by the caller
    wrapper below). ``cfg`` is a models.fields.SDFConfig."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_layers = len(cfg.dims)
    n_lin = num_layers - 1
    d0 = cfg.dims[0]

    def kernel(*refs):
        pts_ref = refs[0]
        w_refs = refs[1:1 + n_lin]
        b_refs = refs[1 + n_lin:1 + 2 * n_lin]
        out_ref = refs[-1]

        x = pts_ref[:] * cfg.scale
        inputs = _pe_rows(x, cfg.multires)
        h = inputs
        inv_sqrt2 = 1.0 / np.sqrt(2.0)
        for l in range(n_lin):
            if l in cfg.skip_in:
                h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
            h = jnp.dot(h, w_refs[l][:], preferred_element_type=jnp.float32)
            h = h + b_refs[l][:]
            if l < n_lin - 1:
                h = _softplus100(h)
        out_ref[:] = h[:, :1] / cfg.scale

    def fn(params, pts):
        n = pts.shape[0]
        grid = (n // tile,)
        weights = [effective_weight(params[f"lin{l}"]) for l in range(n_lin)]
        biases = [params[f"lin{l}"]["b"][None, :] for l in range(n_lin)]

        in_specs = [pl.BlockSpec((tile, pts.shape[1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in weights:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in biases:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
            interpret=interpret,
        )(pts, *weights, *biases)[:, 0]

    return fn


def sdf_value_fused(cfg, params, pts_time: jnp.ndarray,
                    tile: int = DEFAULT_TILE,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Fused SDF evaluation for arbitrary leading shape (..., 4) -> (...).

    Pads the flattened batch to the row tile; off-TPU the kernel runs in
    interpreter mode (pallas TPU kernels need the mosaic backend).
    """
    if interpret is None:
        interpret = not is_tpu_backend()
    flat = pts_time.reshape(-1, pts_time.shape[-1])
    n = flat.shape[0]
    n_pad = (-n) % tile
    if n_pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n_pad, flat.shape[-1]), flat.dtype)], 0)
    fn = build_sdf_value_kernel(cfg, tile, interpret=interpret)
    out = fn(params, flat)[:n]
    return out.reshape(pts_time.shape[:-1])


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
