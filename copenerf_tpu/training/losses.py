"""Loss functions.

Mirrors ``/root/reference/model/losses.py`` (smoothness variants) and the
inline loss math of ``train.py:458-526`` / ``model/training.py:490-549``.
All functions are pure jnp and fuse into the train step under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothness_loss(patches: jnp.ndarray) -> jnp.ndarray:
    """4-direction L1 depth smoothness over (P, ps, ps, 1) patches
    (reference ``SmoothnessLoss``, losses.py:7-18)."""
    l1 = jnp.mean(jnp.abs(patches[:, :, :-1] - patches[:, :, 1:]))
    l2 = jnp.mean(jnp.abs(patches[:, :-1, :] - patches[:, 1:, :]))
    l3 = jnp.mean(jnp.abs(patches[:, :-1, :-1] - patches[:, 1:, 1:]))
    l4 = jnp.mean(jnp.abs(patches[:, 1:, :-1] - patches[:, :-1, 1:]))
    return (l1 + l2 + l3 + l4) / 4.0


def edge_aware_smoothness_loss(patches: jnp.ndarray, rgb: jnp.ndarray,
                               gamma: float = 0.1) -> jnp.ndarray:
    """Bilateral-weighted smoothness: weights exp(-|dI|_1 / gamma)
    (reference ``EdgePreservingSmoothnessLoss``, losses.py:20-38).
    patches: (P, ps, ps, 1) disparity/depth; rgb: (P, ps, ps, 3)."""
    def bf(d):
        return jnp.exp(-jnp.sum(jnp.abs(d), axis=-1) / gamma)[..., None]

    w1 = bf(rgb[:, :, :-1] - rgb[:, :, 1:])
    w2 = bf(rgb[:, :-1, :] - rgb[:, 1:, :])
    w3 = bf(rgb[:, :-1, :-1] - rgb[:, 1:, 1:])
    w4 = bf(rgb[:, 1:, :-1] - rgb[:, :-1, 1:])
    l1 = jnp.mean(jnp.abs(w1 * (patches[:, :, :-1] - patches[:, :, 1:])))
    l2 = jnp.mean(jnp.abs(w2 * (patches[:, :-1, :] - patches[:, 1:, :])))
    l3 = jnp.mean(jnp.abs(w3 * (patches[:, :-1, :-1] - patches[:, 1:, 1:])))
    l4 = jnp.mean(jnp.abs(w4 * (patches[:, 1:, :-1] - patches[:, :-1, 1:])))
    return (l1 + l2 + l3 + l4) / 4.0


def rgb_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """sum |pred - gt| / n_rays (reference model/training.py:508)."""
    return jnp.sum(jnp.abs(pred - gt)) / pred.shape[0]


def eikonal_loss(normals: jnp.ndarray) -> jnp.ndarray:
    """mean (||n|| - 1)^2 over all samples (reference train.py:526)."""
    n = normals.reshape(-1, 3)
    return jnp.mean((jnp.linalg.norm(n, axis=-1) - 1.0) ** 2)


def sdf_flow_loss(scene_flow, normals, sdf_flows, weights) -> jnp.ndarray:
    """Rigid-scene-flow consistency: |<flow, n> + d(sdf)/dt| weighted by the
    (detached) render weights (reference train.py:467-477)."""
    w = jax.lax.stop_gradient(weights.reshape(-1))
    lhs = jnp.sum(scene_flow * normals.reshape(-1, 3), axis=-1)
    return jnp.sum(jnp.abs(lhs + sdf_flows.reshape(-1)) * w) / (
        jnp.sum(w) + 1e-10)


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Monodepth-style SSIM loss over (C, H, W) images with 3x3 average
    pooling and reflection padding (reference losses.py:40-72). Provided for
    API completeness (unused in the reference training loss)."""
    def avg_pool3(img):
        pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
        k = jnp.ones((3, 3)) / 9.0
        return jax.vmap(lambda ch: jax.scipy.signal.convolve2d(
            ch, k, mode="valid"))(pad)

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x, mu_y = avg_pool3(x), avg_pool3(y)
    sig_x = avg_pool3(x * x) - mu_x ** 2
    sig_y = avg_pool3(y * y) - mu_y ** 2
    sig_xy = avg_pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    d = (mu_x ** 2 + mu_y ** 2 + c1) * (sig_x + sig_y + c2)
    return jnp.clip((1 - n / d) / 2, 0, 1)
