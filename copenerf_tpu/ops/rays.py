"""Pixel grids and ray construction.

Mirrors the geometry of the reference (``/root/reference/model/common.py``):
  * ``arange_pixels`` (:12-39) — integer pixel grid + [-1, 1]-scaled coords,
    x scaled by (w-1), y by (h-1), x-major (u, v) ordering.
  * ``origin_to_world`` / ``image_points_to_world`` / ``transform_to_world``
    (:175-215) — rays via inverse(scale) @ inverse(world) @ inverse(camera).

The camera matrix is the reference's NDC-style K
(``dataloading/dataset.py:108-136``):
    [[2 fx / W, 0, 0, 0], [0, -2 fy / H, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def arange_pixels(resolution, image_range=(-1.0, 1.0)):
    """Return (pixel_locations (H*W, 2) int32, pixel_scaled (H*W, 2) f32).

    Row-major scan; each entry is (x, y) = (col, row).
    """
    h, w = resolution
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    loc = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.int64)
    scale = image_range[1] - image_range[0]
    shift = scale / 2.0
    scaled = loc.astype(np.float32).copy()
    scaled[:, 0] = scale * scaled[:, 0] / (w - 1) - shift
    scaled[:, 1] = scale * scaled[:, 1] / (h - 1) - shift
    return loc, scaled


def rays_from_pixels(pixels, camera_mat, world_mat, scale_mat):
    """Build world-space rays for scaled pixel coords.

    Args:
      pixels: (N, 2) scaled pixel coordinates in [-1, 1].
      camera_mat, world_mat, scale_mat: (4, 4) matrices (non-inverted; they
        are inverted here, matching ``invert=True`` in the reference).

    Returns:
      rays_o (N, 3), rays_d (N, 3) unit directions, rays_d_norm (N, 1) the
      pre-normalization direction length (used to convert distance -> depth).
    """
    inv = jnp.linalg.inv(scale_mat) @ jnp.linalg.inv(world_mat) @ \
        jnp.linalg.inv(camera_mat)
    n = pixels.shape[0]
    # Camera origin: inv @ [0, 0, 0, 1].
    origin = inv[:3, 3]
    camera_world = jnp.broadcast_to(origin, (n, 3))
    # Pixels at depth 1: homogeneous [u, v, 1, 1].
    p_hom = jnp.concatenate(
        [pixels, jnp.ones((n, 2), pixels.dtype)], axis=-1)
    pixels_world = p_hom @ inv[:3, :].T  # (N, 3)
    ray = pixels_world - camera_world
    norm = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    return camera_world, ray / norm, norm


def near_far_from_depth_range(n: int, depth_range) -> tuple:
    """Constant near/far planes (the reference's ``near_far_from_sphere``
    collapses to the configured depth range, ``model/training.py:101-118``)."""
    near = jnp.full((n, 1), depth_range[0], jnp.float32)
    far = jnp.full((n, 1), depth_range[1], jnp.float32)
    return near, far
