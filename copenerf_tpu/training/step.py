"""The jitted train step: patch sampling -> rays -> render -> losses ->
gradients -> dual Adam updates, as ONE compiled XLA program.

Covers the per-iteration work of the reference hot loop
(``/root/reference/train.py:407-532`` + ``model/training.py:413-558``),
restructured TPU-first:

  * pixel/patch sampling happens on-device from the resident image tensor
    (no host->device transfer per step beyond scalars);
  * the stage-1 auxiliary losses (sdf-flow, flow-rgb warp, sdf-consistency)
    reuse ONE full-video motion-chain integration per step
    (``full_video_w2c``) instead of the reference's per-pair Python loops —
    identical math by associativity of the pose chain;
  * variable-length reference lists become fixed-size masked tensors;
  * both Adam updates (field nets / motion net) run inside the same program
    with host-computed learning rates fed as scalars.

Gradient flow matches the reference: the field optimizer covers
sdf+color+variance (train.py:59), the motion optimizer covers the motion net
(train.py:60); the background NeRF is never optimized; render weights are
detached in the sdf-flow loss; the sdf-consistency pose chain is detached
unless ``sdf_consistency_enable_pose_grad``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models.fields import motion_apply
from ..ops.interp import warp_pixels
from ..ops.rays import rays_from_pixels
from ..ops.renderer import RendererConfig, render
from ..poses.lie import se3_inverse
from ..poses.motion import full_video_w2c
from .losses import (edge_aware_smoothness_loss, eikonal_loss, rgb_l1_loss,
                     sdf_flow_loss, smoothness_loss)


@dataclasses.dataclass(frozen=True)
class StepStatic:
    """Static (compile-time) switches of the train step."""
    h: int
    w: int
    patch_size: int
    n_points: int
    stage1: bool
    n_images: int
    nb_sample_timestep: int
    n_ref: int
    train_motion: bool
    sdf_cons_pose_grad: bool
    use_flow_rgb: bool
    use_sdf_consistency: bool
    use_importance: bool = True
    smooth_scale: int = 1  # coarse-to-fine scale s; losses scaled 1/2^s
    # Test/parity hook: take ray indices + stratified jitter from the batch
    # ("ray_idx", "t_rand") instead of sampling from the PRNG key, so a
    # harness can replay the reference trainer's exact RNG stream through
    # the REAL jitted step (tests/test_trajectory_parity.py).
    inject_sampling: bool = False


def _flat_topk_indices(z, k: int):
    """EXACT top-k indices of a flat vector via a two-stage selection:
    row-block top-k, then top-k over the survivors. Any global top-k
    element is, within its row, >= all but <= k-1 others, so it survives
    stage 1 — the result equals ``lax.top_k(z, k)[1]`` as a SET (and the
    caller treats it as one). Measured 0.39 ms vs 0.80 ms for the global
    top-64 of the 514k-corner protocol population on v5e."""
    n = z.shape[0]
    cols = 1024
    if k > cols or n <= 2 * cols:
        return jax.lax.top_k(z, k)[1]
    rows = -(-n // cols)
    pad = rows * cols - n
    if pad:
        z = jnp.concatenate([z, jnp.full((pad,), -jnp.inf, z.dtype)])
    v1, i1 = jax.lax.top_k(z.reshape(rows, cols), k)     # (rows, k)
    _, i2 = jax.lax.top_k(v1.reshape(-1), k)
    return (i2 // k) * cols + jnp.take(i1.reshape(-1), i2)


def sample_patch_indices(key, h: int, w: int, patch_size: int, n_points: int):
    """Random patch top-left corners without replacement -> flat ray indices
    (reference ``get_patch_indices``, model/training.py:413-436).

    Uniform sampling without replacement via the Gumbel-top-k identity
    (top-k of iid uniforms = a uniform k-subset): a two-stage ``top_k``
    does a partial selection over the ~(h*w)-entry population instead of
    the full sort a no-replacement ``jax.random.choice`` lowers to."""
    ps = patch_size
    n_patches = n_points // (ps * ps)
    h_adj, w_adj = h - ps + 1, w - ps + 1
    z = jax.random.uniform(key, (h_adj * w_adj,))
    corners = _flat_topk_indices(z, n_patches)
    rows = corners // w_adj
    cols = corners % w_adj
    off = jnp.arange(ps)
    offsets = (off[None, :] + off[:, None] * w).reshape(-1)  # (ps*ps,)
    start = rows * w + cols
    return (start[:, None] + offsets[None, :]).reshape(-1)  # (n_points,)


def _gather_image(images_all, idx):
    """Fetch one (3, H, W) image from the device-resident stack; the stack
    may be uint8 (4x less HBM + host->device transfer) or float32."""
    img = images_all[idx]
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    return img


def _pixels_from_indices(ray_idx, h, w):
    """Flat indices -> ((x, y) float pixels, scaled pixels in [-1, 1])."""
    row = (ray_idx // w).astype(jnp.float32)
    col = (ray_idx % w).astype(jnp.float32)
    p = jnp.stack([col, row], axis=-1)
    p_norm = jnp.stack([2.0 * col / (w - 1) - 1.0,
                        2.0 * row / (h - 1) - 1.0], axis=-1)
    return p, p_norm


def make_optimizers():
    """Adam moments (torch hyperparams b1=.9 b2=.999 eps=1e-8); the lr is
    applied outside so host schedules don't recompile."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def init_train_state(params: dict) -> dict:
    """Adam moments are kept as ONE flat vector per optimizer (not a
    pytree of ~30 small leaves): the per-leaf elementwise update chains
    cost ~1.3 ms/step in launch overhead on TPU, vs ~0.1 ms fused over a
    single contiguous buffer (round-5 tail attribution)."""
    from jax.flatten_util import ravel_pytree

    tx = make_optimizers()
    fields = {k: params[k] for k in ("sdf", "color", "variance")}
    return {
        "params": params,
        "opt_fields": tx.init(ravel_pytree(fields)[0]),
        "opt_motion": tx.init(ravel_pytree({"motion": params["motion"]})[0]),
    }


def migrate_train_state(state: dict) -> dict:
    """Upgrade a loaded checkpoint's optimizer states in place.

    Pre-flat-buffer checkpoints stored the Adam moments as per-leaf pytrees
    (one small array per weight tensor); ``init_train_state`` now keeps ONE
    flat vector per optimizer. The moment trees have exactly the structure
    of the corresponding params subtree, so raveling them in tree-leaves
    order matches ``ravel_pytree``'s layout elementwise — the migrated
    state continues bit-identically. New-format states pass through
    untouched."""
    from jax.flatten_util import ravel_pytree

    for key in ("opt_fields", "opt_motion"):
        st = state.get(key)
        if (isinstance(st, (tuple, list)) and len(st) == 3
                and isinstance(st[1], dict)):
            state[key] = (st[0], ravel_pytree(st[1])[0],
                          ravel_pytree(st[2])[0])
    return state


def compute_losses(field_cfgs: dict, rcfg: RendererConfig, s: StepStatic,
                   params: dict, batch: dict, ray_idx, key=None, t_rand=None,
                   mesh=None):
    """Full per-step loss stack given explicit ray indices.

    Pure function of (params, batch, ray_idx, render randomness): the
    injectable surface the golden aux-loss parity tests drive against the
    reference's inline block (``/root/reference/train.py:458-526``). The
    jitted step samples ``ray_idx`` on-device and calls this.

    ``t_rand`` (n, n_uniform) overrides the stratified jitter (tests);
    otherwise ``key`` supplies it.
    """
    from ..parallel.mesh import shard_rays

    p, p_norm = _pixels_from_indices(ray_idx, s.h, s.w)
    # The whole dataset stays device-resident; per-step image selection is
    # an on-device gather.
    image = _gather_image(batch["images_all"], batch["image_idx"])
    camera_mat = batch["K_all"][batch["image_idx"]]
    img_flat = image.reshape(3, s.h * s.w)
    ray_idx = shard_rays(mesh, ray_idx)
    p = shard_rays(mesh, p)
    p_norm = shard_rays(mesh, p_norm)
    rgb_gt = shard_rays(mesh, img_flat[:, ray_idx].T)    # (N, 3)

    rays_o, rays_d, rays_d_norm = rays_from_pixels(
        p_norm, camera_mat, batch["world_mat"], batch["scale_mat"])
    rays_o = shard_rays(mesh, rays_o)
    rays_d = shard_rays(mesh, rays_d)
    rays_d_norm = shard_rays(mesh, rays_d_norm)
    n = rays_o.shape[0]
    near = jnp.full((n, 1), 1.0) * batch["near"]
    far = jnp.full((n, 1), 1.0) * batch["far"]

    # The sdf-consistency world transform is computed BEFORE the render so
    # its value-only SDF re-query can be FOLDED into the render-core kernel
    # launch (shares weight residency + the gradient accumulation stream;
    # replaces the separate value-kernel fwd+bwd that cost ~5.6 ms/step).
    cons = None
    w2c_all = inv_here = None
    if s.stage1 and (s.use_flow_rgb or s.use_sdf_consistency):
        w2c_all = full_video_w2c(field_cfgs["motion"], params["motion"],
                                 s.n_images, s.nb_sample_timestep)
        inv_here = se3_inverse(w2c_all[batch["image_idx"]])
        if s.use_sdf_consistency:
            cw2 = w2c_all[batch["world_cam_idx"]] @ inv_here
            if not s.sdf_cons_pose_grad:
                cw2 = jax.lax.stop_gradient(cw2)
            cons = (cw2, batch["world_time_step"])

    out = render(field_cfgs, params, rays_o, rays_d, rays_d_norm,
                 batch["query_time_step"], near, far, rcfg=rcfg,
                 cos_anneal_ratio=batch["cos_anneal_ratio"],
                 use_importance=s.use_importance, train=True,
                 key=key, t_rand=t_rand, cons=cons)

    w = batch["loss_weights"]
    rgb_loss = rgb_l1_loss(out["color_fine"], rgb_gt)
    l2_mean = jnp.mean((out["color_fine"] - rgb_gt) ** 2)
    eik_loss = eikonal_loss(out["normals"])

    sdf_loss = jnp.zeros(())
    flow_rgb_loss = jnp.zeros(())
    sdf_cons_loss = jnp.zeros(())
    edge_loss = jnp.zeros(())
    smooth_loss = jnp.zeros(())

    if s.stage1:
        pts = out["sampled_points"].reshape(-1, 3)
        weights_flat = out["weights"].reshape(-1)
        # --- sdf-flow loss (train.py:467-477) ---
        omega, vel = motion_apply(
            field_cfgs["motion"], params["motion"],
            batch["query_time_step"].reshape(1, 1))
        scene_flow = jnp.cross(jnp.broadcast_to(omega[0], pts.shape),
                               pts) + vel[0]
        sdf_loss = sdf_flow_loss(scene_flow, out["normals"],
                                 out["sdf_flows"], weights_flat)

        if s.use_flow_rgb or s.use_sdf_consistency:
            # Gate: the reference computes this block only when the ref
            # list is non-empty (train.py:479). w2c_all/inv_here computed
            # above (before the render, for the folded consistency query).
            any_ref = jnp.max(batch["ref_in_list"]) > 0

            if s.use_sdf_consistency:
                sdf_w = out["sdf_world"].reshape(-1)
                active = jnp.logical_and(
                    any_ref,
                    batch["image_idx"] != batch["world_cam_idx"])
                sdf_cons_loss = jnp.where(
                    active,
                    jnp.mean(jnp.abs(sdf_w - out["sdf"].reshape(-1))),
                    0.0)

            if s.use_flow_rgb:
                ray_weights = out["weights"][..., None]     # (N, S, 1)
                pts_r = out["sampled_points"]               # (N, S, 3)

                def one_ref(t):
                    ref_idx = jnp.clip(batch["ref_idxs"][t], 0,
                                       s.n_images - 1)
                    w2c_t = w2c_all[ref_idx] @ inv_here
                    pts_map = pts_r @ w2c_t[:3, :3].T + w2c_t[:3, 3]
                    wpm = jnp.sum(ray_weights * pts_map, axis=1)  # (N,3)
                    proj = (batch["scale_mat"][:3, :3] @
                            batch["K_all"][ref_idx][:3, :3])
                    pix = wpm @ proj.T
                    z = pix[:, 2:]
                    z_safe = jnp.where(jnp.abs(z) < 1e-8,
                                       jnp.where(z < 0, -1e-8, 1e-8), z)
                    pix2 = pix[:, :2] / z_safe
                    flow = pix2 - p_norm
                    flow = flow * jnp.asarray([s.w / 2.0, s.h / 2.0])
                    corr = p + flow
                    in_bounds = jnp.logical_and(
                        jnp.all(corr >= 0, axis=1),
                        jnp.all(corr < jnp.asarray(
                            [float(s.w), float(s.h)]), axis=1))
                    valid = (in_bounds.astype(jnp.float32) *
                             batch["ref_valid_flow"][t])
                    valid = jax.lax.stop_gradient(valid)[:, None]
                    warped = warp_pixels(
                        _gather_image(batch["images_all"], ref_idx),
                        corr, normalize=True)
                    return (jnp.sum(jnp.abs(warped - rgb_gt) * valid) /
                            (jnp.sum(valid) + 1e-10))

                losses_t = jnp.stack(
                    [one_ref(t) for t in range(s.n_ref)])
                flow_rgb_loss = jnp.where(
                    any_ref, jnp.sum(losses_t) / 3.0, 0.0)

    ps = s.patch_size
    if ps > 1:
        n_patches = s.n_points // (ps * ps)
        disp = out["depth_pred"].reshape(n_patches, ps, ps, 1)
        rgb_grid = rgb_gt.reshape(n_patches, ps, ps, 3)
        scale = 1.0 / (2 ** s.smooth_scale)
        edge_loss = scale * edge_aware_smoothness_loss(disp, rgb_grid)
        smooth_loss = scale * smoothness_loss(disp)

    total = (w["rgb"] * rgb_loss + w["eikonal"] * eik_loss +
             w["sdf"] * sdf_loss + w["flow_rgb"] * flow_rgb_loss +
             w["sdf_consistency"] * sdf_cons_loss +
             w["edge_smooth"] * edge_loss + w["smooth"] * smooth_loss)

    metrics = {
        "loss": total, "loss_rgb": rgb_loss, "loss_eikonal": eik_loss,
        "l2_mean": l2_mean, "loss_sdf": sdf_loss,
        "loss_flow_rgb": flow_rgb_loss,
        "sdf_consistency_loss": sdf_cons_loss,
        "edge_aware_smoothness_loss": edge_loss,
        "smoothness_loss": smooth_loss,
        "s_val": jnp.mean(out["s_val"]),
        "cdf_fine": jnp.mean(out["cdf_fine"]),
        "weight_sum": jnp.mean(out["weight_sum"]),
        "weight_max": jnp.mean(out["weight_max"]),
        "psnr": -10.0 * jnp.log10(jnp.maximum(l2_mean, 1e-10)),
    }
    return total, metrics


def build_train_step(field_cfgs: dict, rcfg: RendererConfig,
                     static: StepStatic, mesh=None):
    """Return a jitted ``step(state, batch, key) -> (state, metrics)``.

    With ``mesh`` (a 1-D ``('data',)`` jax Mesh), the ray batch is sharded
    across devices via sharding constraints; params stay replicated and GSPMD
    inserts the gradient all-reduce over ICI. ``n_points`` must divide the
    mesh size.
    """
    tx = make_optimizers()
    s = static

    def loss_fn(trainable, frozen_params, batch, key):
        params = dict(frozen_params)
        params.update(trainable["fields"])
        params["motion"] = trainable["motion"]

        k_patch, k_render = jax.random.split(key)
        if s.inject_sampling:
            return compute_losses(field_cfgs, rcfg, s, params, batch,
                                  batch["ray_idx"], key=k_render,
                                  t_rand=batch["t_rand"], mesh=mesh)
        ray_idx = sample_patch_indices(k_patch, s.h, s.w, s.patch_size,
                                       s.n_points)
        return compute_losses(field_cfgs, rcfg, s, params, batch, ray_idx,
                              key=k_render, mesh=mesh)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: dict, batch: dict, key) -> tuple:
        params = state["params"]
        trainable = {
            "fields": {k: params[k] for k in ("sdf", "color", "variance")},
            "motion": params["motion"],
        }
        frozen = {"nerf": params["nerf"]}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(trainable, frozen, batch, key)

        # Flat-buffer Adam: one fused elementwise chain over a contiguous
        # vector instead of ~30 per-leaf kernels (see init_train_state).
        from jax.flatten_util import ravel_pytree

        gflat_f, _ = ravel_pytree(grads["fields"])
        pflat_f, unravel_f = ravel_pytree(trainable["fields"])
        updates_f, opt_fields = tx.update(gflat_f, state["opt_fields"],
                                          pflat_f)
        new_fields = unravel_f(pflat_f - batch["lr"] * updates_f)

        if s.train_motion:
            gflat_m, _ = ravel_pytree({"motion": grads["motion"]})
            pflat_m, unravel_m = ravel_pytree(
                {"motion": trainable["motion"]})
            updates_m, opt_motion = tx.update(gflat_m, state["opt_motion"],
                                              pflat_m)
            new_motion = unravel_m(
                pflat_m - batch["motion_lr"] * updates_m)["motion"]
        else:
            opt_motion = state["opt_motion"]
            new_motion = trainable["motion"]

        new_params = dict(new_fields)
        new_params["motion"] = new_motion
        new_params["nerf"] = params["nerf"]
        new_state = {"params": new_params, "opt_fields": opt_fields,
                     "opt_motion": opt_motion}
        return new_state, metrics

    return step


def make_loss_weights(rgb, eikonal, sdf, flow_rgb, sdf_consistency,
                      edge_smooth, smooth) -> dict:
    return {
        "rgb": jnp.asarray(rgb, jnp.float32),
        "eikonal": jnp.asarray(eikonal, jnp.float32),
        "sdf": jnp.asarray(sdf, jnp.float32),
        "flow_rgb": jnp.asarray(flow_rgb, jnp.float32),
        "sdf_consistency": jnp.asarray(sdf_consistency, jnp.float32),
        "edge_smooth": jnp.asarray(edge_smooth, jnp.float32),
        "smooth": jnp.asarray(smooth, jnp.float32),
    }
