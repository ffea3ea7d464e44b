"""Bilinear image sampling (grid_sample equivalent).

Matches ``torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)`` as used by the reference's
photometric warping (``/root/reference/train.py:235-244``,
``utils_poses/pose_refinement.py:56``): coords in [-1, 1] map linearly onto
[0, W-1] x [0, H-1]; out-of-range coords clamp to the border.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(image: jnp.ndarray, coords: jnp.ndarray):
    """Sample ``image`` (C, H, W) at ``coords`` (N, 2) in [-1, 1] (x, y).

    Returns (N, C). Border padding, align_corners=True.
    """
    c, h, w = image.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = x - x0
    wy = y - y0

    flat = image.reshape(c, h * w)

    def gather(yy, xx):
        return flat[:, yy * w + xx].T  # (N, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx)[:, None] + v01 * wx[:, None]
    bot = v10 * (1 - wx)[:, None] + v11 * wx[:, None]
    return top * (1 - wy)[:, None] + bot * wy[:, None]


def warp_pixels(image: jnp.ndarray, uv: jnp.ndarray, normalize: bool = True):
    """Reference ``Trainer.warp_pixel`` (train.py:235-244): ``uv`` (N, 2) in
    pixel units when ``normalize``; returns (N, C) sampled colors."""
    _, h, w = image.shape
    if normalize:
        x = uv[:, 0] / ((w - 1) / 2.0) - 1.0
        y = uv[:, 1] / ((h - 1) / 2.0) - 1.0
        uv = jnp.stack([x, y], axis=-1)
    return grid_sample_bilinear(image, uv)
