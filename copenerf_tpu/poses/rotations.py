"""Rotation-representation conversions (jnp, batched).

Semantics follow the conventions the reference vendors from PyTorch3D
(``/root/reference/utils_poses/pose_pytorch3d.py``): for convention "XYZ",
``euler_angles_to_matrix`` returns Rx @ Ry @ Rz (:8-19); the quaternion order
is (w, x, y, z).
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(axis)
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler: jnp.ndarray, convention: str = "XYZ"):
    """(..., 3) Euler angles -> (..., 3, 3)."""
    mats = [_axis_rotation(axis, euler[..., i])
            for i, axis in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def _index_from_letter(letter: str) -> int:
    return {"X": 0, "Y": 1, "Z": 2}[letter]


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str = "XYZ"):
    """(..., 3, 3) -> (..., 3) Euler angles (PyTorch3D semantics)."""
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(matrix[..., i0, i2] *
                             (-1.0 if i0 - i2 in [-1, 2] else 1.0))
    else:
        central = jnp.arccos(matrix[..., i0, i0])
    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False,
                        tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True,
                        tait_bryan),
    )
    return jnp.stack(o, axis=-1)


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) quaternion (w, x, y, z)."""
    m = matrix
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    def sqrt_pos(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    w = 0.5 * sqrt_pos(1 + m00 + m11 + m22)
    x = 0.5 * sqrt_pos(1 + m00 - m11 - m22)
    y = 0.5 * sqrt_pos(1 - m00 + m11 - m22)
    z = 0.5 * sqrt_pos(1 - m00 - m11 + m22)
    x = jnp.copysign(x, m[..., 2, 1] - m[..., 1, 2])
    y = jnp.copysign(y, m[..., 0, 2] - m[..., 2, 0])
    z = jnp.copysign(z, m[..., 1, 0] - m[..., 0, 1])
    return jnp.stack([w, x, y, z], axis=-1)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) (w, x, y, z) -> (..., 3) axis-angle."""
    norms = jnp.linalg.norm(quat[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quat[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < 1e-6
    sin_half_over = jnp.where(
        small, 0.5 - angles * angles / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles))
    return quat[..., 1:] / sin_half_over


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))
