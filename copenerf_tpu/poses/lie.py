"""SO(3)/SE(3) helpers (jnp, batched).

Mirrors ``/root/reference/model/common.py``: ``vec2skew`` (:255-265),
``Exp`` (:268-277, Rodrigues with +1e-15 norm guard), ``make_c2w`` (:279-288).
"""

from __future__ import annotations

import jax.numpy as jnp


def vec2skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def exp_so3(r: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    skew = vec2skew(r)
    norm = jnp.linalg.norm(r, axis=-1)[..., None, None] + 1e-15
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), skew.shape)
    return (eye + (jnp.sin(norm) / norm) * skew +
            ((1.0 - jnp.cos(norm)) / norm ** 2) * (skew @ skew))


def make_c2w(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) + translation (..., 3) -> SE(3) (..., 4, 4)."""
    rot = exp_so3(r)
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], r.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 4, 4) rigid transforms."""
    rot = m[..., :3, :3]
    t = m[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate([rot_t, -rot_t @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], m.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)
