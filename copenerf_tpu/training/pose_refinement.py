"""Stage-1 -> stage-2 pose refinement.

Mirrors ``/root/reference/utils_poses/pose_refinement.py``: per-consecutive-
pair relative poses (optionally initialized from the motion field) optimized
by bidirectional depth-based photometric warping, with a 50-epoch
convergence window. The whole batched warp + loss + Adam update is one jitted
program; pairs are gathered on-device by index.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops.interp import grid_sample_bilinear
from ..poses.lie import make_c2w, se3_inverse
from ..poses.motion import full_video_w2c, w2c_mappings
from .schedules import MultiStepLR
from .step import make_optimizers


def _uv_grid(h: int, w: int) -> jnp.ndarray:
    """(3, h, w): x, y normalized to [-1, 1], ones
    (reference setup_pose_refinement :92-100)."""
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    xs = xs / ((w - 1) / 2.0) - 1.0
    ys = ys / ((h - 1) / 2.0) - 1.0
    return jnp.asarray(np.stack([xs, ys, np.ones_like(xs)], 0))


def _warp_terms(img, next_img, depth, k33, uv, rel):
    """One direction of the photometric warp loss (reference :34-61).

    Returns (masked-abs-diff sum, valid-pixel count) for ONE pair; the
    caller forms the reference's batch-wide ratio
    ``sum_pairs(num) / sum_pairs(den)`` (``compute_loss_and_warp_image``
    divides by the mask sum of the whole 16-pair batch, not per pair).
    """
    xyz = jnp.linalg.inv(k33) @ (uv * depth[None]).reshape(3, -1)
    tx = rel[:3, :3] @ xyz + rel[:3, 3:]
    uvt = k33 @ tx
    # Guard the projective division: points at z ~ 0 are invalid anyway, but
    # an exact 0/0 would poison the masked sum with NaNs.
    z = uvt[2:]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, jnp.where(z < 0, -1e-8, 1e-8), z)
    uv2 = uvt[:2] / z_safe
    valid = jnp.logical_and(jnp.abs(uv2[0]) <= 1.0,
                            jnp.abs(uv2[1]) <= 1.0).astype(jnp.float32)
    warped = grid_sample_bilinear(next_img, uv2.T)          # (h*w, 3)
    img_flat = img.reshape(3, -1).T
    num = jnp.sum(jnp.abs(warped - img_flat) * valid[:, None])
    return num, jnp.sum(valid)


def batched_warp_loss(images, next_images, depths, k33, uv, rels):
    """Reference ``compute_loss_and_warp_image`` loss over a pair batch:
    one ratio of batch-wide sums (:34-61)."""
    nums, dens = jax.vmap(
        lambda i, n, d, k, r: _warp_terms(i, n, d, k, uv, r))(
            images, next_images, depths, k33, rels)
    return jnp.sum(nums) / (jnp.sum(dens) + 1e-10)


def run_pose_refinement(images, depths, k33_list, *, init_c2w=None,
                        lr: float = 1e-3, epochs: int = 2000,
                        batch_size: int = 16, logger=None, gt_poses=None,
                        pose_error_fn=None, log_prefix: str = "poseRefine",
                        convergence_std: float = 1e-5):
    """Optimize M-1 relative poses between consecutive train views.

    Args:
      images: (M, 3, h, w) train images.
      depths: (M, h, w) rendered stage-1 depths.
      k33_list: (M, 3, 3) NDC-style intrinsics.
      init_c2w: optional (M-1, 4, 4) initial relative poses.
    Returns:
      pred_poses (M, 4, 4) camera-to-world (inverse of the chained w2c).
    """
    m = len(images)
    n_pairs = m - 1
    h, w = depths.shape[1:]
    uv = _uv_grid(h, w)
    images = jnp.asarray(images)
    depths = jnp.asarray(depths)
    k33 = jnp.asarray(k33_list)
    if init_c2w is None:
        init_c2w = jnp.broadcast_to(jnp.eye(4), (n_pairs, 4, 4))
    else:
        init_c2w = jnp.asarray(init_c2w)

    params = {"r": jnp.zeros((n_pairs, 3)), "t": jnp.zeros((n_pairs, 3))}
    tx = make_optimizers()
    opt_state = tx.init(params)

    @jax.jit
    def refine_step(params, opt_state, idx, lr):
        def loss_fn(p):
            rel = make_c2w(p["r"][idx], p["t"][idx]) @ init_c2w[idx]
            img = images[idx]
            nxt = images[idx + 1]
            dep = depths[idx]
            ndep = depths[idx + 1]
            kk = k33[idx]

            # Reference loss semantics (perform_pose_refinement :121-123):
            # forward and backward warps each form ONE batch-wide masked
            # ratio, then average the two directions.
            pos = batched_warp_loss(img, nxt, dep, kk, uv, rel)
            neg = batched_warp_loss(nxt, img, ndep, kk, uv,
                                    jax.vmap(se3_inverse)(rel))
            return (pos + neg) / 2.0

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda p, u: p - lr * u, params,
                                         updates)
        return params2, opt_state2, loss

    def chained_poses(params):
        rel_all = np.asarray(make_c2w(params["r"], params["t"]) @ init_c2w)
        w2c = np.asarray(w2c_mappings(jnp.asarray(rel_all)))
        return np.linalg.inv(w2c).astype(np.float32)

    loss_window = []
    # Reference pose_refinement.py:89-91: MultiStepLR(milestones=
    # range(30, 10000, 10), gamma=0.9); torch decays the lr USED IN the
    # milestone epoch (see training.schedules.MultiStepLR).
    sched = MultiStepLR(lr, range(30, 10000, 10), 0.9)
    ran_any = False
    for epoch in range(epochs):
        ran_any = True
        cur_lr = sched.epoch_lr(epoch)
        batch_losses, batch_sizes = [], []
        for start in range(0, n_pairs, batch_size):
            idx = jnp.arange(start, min(start + batch_size, n_pairs))
            params, opt_state, loss = refine_step(params, opt_state, idx,
                                                  jnp.asarray(cur_lr))
            batch_losses.append(loss)  # device scalar; keep pipeline busy
            batch_sizes.append(len(idx))
        # One batched fetch per epoch (needed for the convergence window).
        running = float(np.dot(jax.device_get(batch_losses),
                               batch_sizes)) / n_pairs

        if logger is not None:
            logger.add_scalar(f"{log_prefix}/_loss", running, epoch)
            logger.add_scalar(f"{log_prefix}/lr", cur_lr, epoch)
            if gt_poses is not None and pose_error_fn is not None:
                _, rpe_t, rpe_r, ate = pose_error_fn(chained_poses(params),
                                                     gt_poses)
                logger.add_scalar(f"{log_prefix}/rpe_trans", rpe_t, epoch)
                logger.add_scalar(f"{log_prefix}/rpe_rot", rpe_r, epoch)
                logger.add_scalar(f"{log_prefix}/ate", ate, epoch)

        if len(loss_window) >= 50:
            loss_window.pop(0)
        loss_window.append(running)
        if len(loss_window) == 50 and np.std(loss_window) <= convergence_std:
            break
    return chained_poses(params) if ran_any else None


def motion_init_relative_poses(motion_cfg, motion_params, i_train,
                               total_nb_images, nb_sample_timestep):
    """Initial consecutive-train-view relative poses from the motion field
    (reference setup_pose_refinement :75-84); spans gaps over test frames."""
    w2c_all = full_video_w2c(motion_cfg, motion_params, total_nb_images,
                             nb_sample_timestep)
    i_train = np.asarray(i_train)
    src = jnp.asarray(i_train[:-1])
    dst = jnp.asarray(i_train[1:])
    return w2c_all[dst] @ se3_inverse(w2c_all[src])
