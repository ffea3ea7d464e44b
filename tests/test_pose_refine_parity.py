"""Golden parity of the pose-refinement warp loss against the reference
``compute_loss_and_warp_image`` (/root/reference/utils_poses/
pose_refinement.py:34-61), including the bidirectional combination used by
``perform_pose_refinement`` (:121-123)."""

import numpy as np
import pytest

import conftest

pytestmark = pytest.mark.skipif(not conftest.has_reference(),
                                reason="reference repo not available")

ref_train = conftest.setup_reference_trainer_env()

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from utils_poses.pose_refinement import compute_loss_and_warp_image  # noqa: E402

from copenerf_tpu.poses.lie import se3_inverse  # noqa: E402
from copenerf_tpu.training.pose_refinement import (_uv_grid,  # noqa: E402
                                                   batched_warp_loss)


def _rand_batch(b, h, w, seed):
    rng = np.random.RandomState(seed)
    images = rng.rand(b, 3, h, w).astype(np.float32)
    next_images = rng.rand(b, 3, h, w).astype(np.float32)
    depths = (rng.rand(b, 1, h, w) * 3 + 0.5).astype(np.float32)
    fx, fy = 2 * 50.0 / w, -2 * 50.0 / h
    k = np.array([[fx, 0, 0], [0, fy, 0], [0, 0, -1]], np.float32)
    k_batch = np.stack([k] * b)
    rels = []
    for i in range(b):
        aa = rng.randn(3) * 0.05
        t = rng.randn(3) * 0.05
        angle = np.linalg.norm(aa)
        axis = aa / (angle + 1e-12)
        kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                       [-axis[1], axis[0], 0]])
        rot = np.eye(3) + np.sin(angle) * kx + (1 - np.cos(angle)) * kx @ kx
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = rot
        m[:3, 3] = t
        rels.append(m)
    return images, next_images, depths, k_batch, np.stack(rels)


@pytest.mark.parametrize("seed", [0, 1])
def test_warp_loss_parity(seed):
    b, h, w = 5, 24, 32
    images, next_images, depths, k_batch, rels = _rand_batch(b, h, w, seed)

    uv_j = _uv_grid(h, w)
    uv_t = torch.from_numpy(np.asarray(uv_j))
    uv_batch = uv_t.unsqueeze(0).repeat(b, 1, 1, 1)

    warp_fn = lambda src_frame, uv, normalize_pix=True: \
        ref_train.Trainer.warp_pixel(None, src_frame, uv, normalize_pix)

    ref_loss, ref_warped = compute_loss_and_warp_image(
        torch.from_numpy(images), torch.from_numpy(next_images),
        torch.from_numpy(depths), torch.from_numpy(k_batch), uv_batch,
        torch.from_numpy(rels), warp_fn)

    ours = batched_warp_loss(
        jnp.asarray(images), jnp.asarray(next_images),
        jnp.asarray(depths[:, 0]), jnp.asarray(k_batch), uv_j,
        jnp.asarray(rels))
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-4,
                               atol=1e-5)


def test_bidirectional_combination_parity():
    """(pos + neg)/2 with inverse poses, reference :121-123."""
    b, h, w = 4, 20, 28
    images, next_images, depths, k_batch, rels = _rand_batch(b, h, w, 7)
    next_depths = depths[::-1].copy()

    uv_j = _uv_grid(h, w)
    uv_t = torch.from_numpy(np.asarray(uv_j))
    uv_batch = uv_t.unsqueeze(0).repeat(b, 1, 1, 1)

    warp_fn = lambda src_frame, uv, normalize_pix=True: \
        ref_train.Trainer.warp_pixel(None, src_frame, uv, normalize_pix)

    pos_t, _ = compute_loss_and_warp_image(
        torch.from_numpy(images), torch.from_numpy(next_images),
        torch.from_numpy(depths), torch.from_numpy(k_batch), uv_batch,
        torch.from_numpy(rels), warp_fn)
    neg_t, _ = compute_loss_and_warp_image(
        torch.from_numpy(next_images), torch.from_numpy(images),
        torch.from_numpy(next_depths), torch.from_numpy(k_batch), uv_batch,
        torch.inverse(torch.from_numpy(rels)), warp_fn)
    ref_total = (float(pos_t) + float(neg_t)) / 2.0

    rels_j = jnp.asarray(rels)
    pos_j = batched_warp_loss(jnp.asarray(images), jnp.asarray(next_images),
                              jnp.asarray(depths[:, 0]),
                              jnp.asarray(k_batch), uv_j, rels_j)
    neg_j = batched_warp_loss(jnp.asarray(next_images), jnp.asarray(images),
                              jnp.asarray(next_depths[:, 0]),
                              jnp.asarray(k_batch), uv_j,
                              jax.vmap(se3_inverse)(rels_j))
    ours = (float(pos_j) + float(neg_j)) / 2.0
    np.testing.assert_allclose(ours, ref_total, rtol=1e-4, atol=1e-5)
