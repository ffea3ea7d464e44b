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
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues).

    Differentiable at r = 0: the sin(n)/n and (1-cos n)/n^2 coefficients
    switch to their Taylor expansions below n = 1e-3 with the double-where
    pattern, so gradients at the origin are exact zeros rather than the
    NaN/underflow a naive ``jnp.linalg.norm`` formulation produces in f32
    (the reference relies on torch's norm-at-0 zero-gradient convention when
    Adam steps zero-initialized pose corrections)."""
    skew = vec2skew(r)
    sq = jnp.sum(r * r, axis=-1)[..., None, None]
    small = sq < 1e-6
    safe_n = jnp.sqrt(jnp.where(small, 1.0, sq))
    coeff_a = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(safe_n) / safe_n)
    coeff_b = jnp.where(small, 0.5 - sq / 24.0,
                        (1.0 - jnp.cos(safe_n)) / jnp.where(small, 1.0, sq))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), skew.shape)
    return eye + coeff_a * skew + coeff_b * (skew @ skew)


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
