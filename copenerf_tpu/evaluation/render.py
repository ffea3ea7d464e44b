"""Chunked full-image rendering (visualization, stage-1 extraction, eval).

Replaces the reference's 1024-pixel python chunk loop
(``/root/reference/model/training.py:210-283``, ``eval.py:133-157``) with a
fixed-size jitted chunk program reused across all images and views (one
compile, arbitrary resolutions via padding).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.rays import rays_from_pixels
from ..ops.renderer import RendererConfig, render


class ImageRenderer:
    """Holds a jitted chunked renderer for one (field_cfgs, rcfg).

    ``chunk`` is the MAX rays per device dispatch (default 32768; 65536
    exceeds v5e HBM with the 128-sample bookkeeping). Per image the
    effective chunk is capped at the next power of two >= the pixel count,
    so small visualization frames don't pay 32k-ray padding; one program is
    compiled per distinct effective chunk (<= 6 sizes) and reused across
    all views/resolutions (h/w are traced scalars, pixels are generated
    on device).
    """

    def __init__(self, field_cfgs: dict, rcfg: RendererConfig,
                 chunk: int = 32768, mesh=None):
        self.field_cfgs = field_cfgs
        self.rcfg = rcfg
        self.min_chunk = 1024
        if mesh is not None:
            # Shard each chunk's rays across the mesh (eval scales over
            # chips like training does); chunks stay multiples of the mesh.
            self.min_chunk = max(self.min_chunk, mesh.size)
        # Honor small user-configured chunks (still >= mesh size); round the
        # cap DOWN to a power-of-two multiple of min_chunk so the doubling
        # loop below can never overshoot a non-power-of-two cap (the cap is
        # an HBM-safety limit, so it must be a true maximum).
        if mesh is not None and chunk < mesh.size:
            # Rounding up to a mesh multiple would silently exceed the
            # configured HBM-safety cap — refuse instead.
            raise ValueError(
                f"render chunk {chunk} < mesh size {mesh.size}; the chunk "
                "cap is an HBM maximum and cannot be rounded up to a mesh "
                "multiple — raise training.render_chunk or shrink the mesh")
        self.min_chunk = min(self.min_chunk, max(chunk, 1))
        if mesh is not None:
            # Round DOWN to a mesh multiple (never up: the cap is an HBM
            # maximum). chunk >= mesh.size is guaranteed above, so the
            # rounded value stays >= mesh.size.
            self.min_chunk -= self.min_chunk % mesh.size
        self.chunk = self.min_chunk
        while self.chunk * 2 <= chunk:
            self.chunk *= 2

        from ..parallel.mesh import shard_rays

        # Pixel coordinates are generated ON DEVICE from (start, h, w):
        # the host loop ships only scalars per chunk. On a tunneled backend
        # the per-chunk host->device pixel upload (chunk x 2 floats) was a
        # measurable part of frame latency; on local hardware it is simply
        # zero host work in the hot loop.
        # chunk/h/w are STATIC: the divisions constant-fold (a traced
        # divisor makes the integer div/mod dynamic and hurts compile and
        # runtime), and only a handful of resolutions occur per run.
        @partial(jax.jit, static_argnums=(1, 3, 4))
        def _chunk_fn(params, chunk, start, h, w, camera_mat, world_mat,
                      scale_mat, time_step, near, far, cos_anneal_ratio):
            idx = jnp.minimum(start + jnp.arange(chunk), h * w - 1)
            row = (idx // w).astype(jnp.float32)
            col = (idx % w).astype(jnp.float32)
            pixels = jnp.stack([2.0 * col / (w - 1.0) - 1.0,
                                2.0 * row / (h - 1.0) - 1.0], axis=-1)
            pixels = shard_rays(mesh, pixels)
            rays_o, rays_d, rays_d_norm = rays_from_pixels(
                pixels, camera_mat, world_mat, scale_mat)
            rays_o = shard_rays(mesh, rays_o)
            rays_d = shard_rays(mesh, rays_d)
            rays_d_norm = shard_rays(mesh, rays_d_norm)
            n = rays_o.shape[0]
            near_v = jnp.full((n, 1), 1.0) * near
            far_v = jnp.full((n, 1), 1.0) * far
            out = render(field_cfgs, params, rays_o, rays_d, rays_d_norm,
                         time_step, near_v, far_v, rcfg=rcfg,
                         cos_anneal_ratio=cos_anneal_ratio,
                         use_importance=True, train=False)
            weights = out["weights"]                       # (N, S)
            normals = out["normals"]                       # (N, S, 3)
            normal_w = jnp.sum(normals * weights[..., None], axis=1)
            # Rotate into the anchor frame; world_mat == I is a no-op, which
            # matches the reference's conditional (model/training.py:238-243).
            normal_w = normal_w @ world_mat[:3, :3].T
            pts = out["sampled_points"]                    # (N, S, 3)
            pts_t = pts @ world_mat[:3, :3].T + world_mat[:3, 3]
            max_idx = jnp.argmax(weights, axis=1)
            # One-hot contraction instead of take_along_axis: per-row
            # dynamic gathers lower to serial slices on TPU (see
            # ops/sampling._gather_last_axis); exact since each row has a
            # single 1.0, run at HIGHEST so no bf16 pass truncates pts.
            onehot = (max_idx[:, None] ==
                      jnp.arange(weights.shape[1])).astype(pts_t.dtype)
            pts_max = jnp.einsum("ns,nsc->nc", onehot, pts_t,
                                 precision=jax.lax.Precision.HIGHEST)
            depth_highest = -pts_max[:, 2]
            return {
                "color": out["color_fine"],
                "depth": out["depth_pred"][:, 0],
                "weighted_z": out["weighted_z_vals"][:, 0],
                "normal": normal_w,
                "depth_highest": depth_highest,
                "weights": weights,
                "pts": pts,
            }

        self._chunk_fn = _chunk_fn

    def render_image(self, params, camera_mat, world_mat, scale_mat,
                     time_step, resolution, depth_range, cos_anneal_ratio,
                     want_pts: bool = False):
        """Render a full (h, w) view. Returns a dict of numpy arrays:
        color (h, w, 3), depth (h, w), weighted_z (h, w), normal (h, w, 3),
        depth_highest (h, w) [, weights/pts per chunk when ``want_pts``]."""
        h, w = int(resolution[0]), int(resolution[1])
        n = h * w
        if jax.process_count() > 1:
            # Under multi-process training the params are arrays on the
            # GLOBAL mesh; this render program runs on the process-LOCAL
            # mesh (each process renders independently). Fully-replicated
            # global arrays convert to host numpy, which the local jit
            # re-places on local devices. (Caught by the 2-process
            # endurance test: feeding global-mesh params into the local
            # sharding constraint is a device-set mismatch.)
            params = jax.tree_util.tree_map(np.asarray, params)
        # Effective chunk: next power of two covering n, capped at self.chunk.
        chunk = self.min_chunk
        while chunk < n and chunk < self.chunk:
            chunk *= 2
        n_total = n + ((-n) % chunk)

        outs = {k: [] for k in
                ("color", "depth", "weighted_z", "normal", "depth_highest")}
        extra = {"weights": [], "pts": []} if want_pts else None
        camera_mat = jnp.asarray(camera_mat)
        world_mat = jnp.asarray(world_mat)
        scale_mat = jnp.asarray(scale_mat)
        # Results stay on device until the end: the host fetch of chunk i
        # would otherwise serialize against the dispatch of chunk i+1.
        for i in range(0, n_total, chunk):
            res = self._chunk_fn(
                params, chunk, jnp.asarray(i, jnp.int32), h, w,
                camera_mat, world_mat, scale_mat,
                jnp.asarray(time_step, jnp.float32),
                jnp.asarray(depth_range[0], jnp.float32),
                jnp.asarray(depth_range[1], jnp.float32),
                jnp.asarray(cos_anneal_ratio, jnp.float32))
            for k in outs:
                outs[k].append(res[k])
            if want_pts:
                extra["weights"].append(res["weights"])
                extra["pts"].append(res["pts"])

        outs = jax.device_get(outs)
        result = {}
        for k, chunks in outs.items():
            arr = np.concatenate(chunks, 0)[:n]
            if k in ("color", "normal"):
                result[k] = arr.reshape(h, w, -1)
            else:
                result[k] = arr.reshape(h, w)
        if want_pts:
            extra = jax.device_get(extra)
            result["weights_flat"] = np.concatenate(extra["weights"], 0)[:n]
            result["pts_flat"] = np.concatenate(extra["pts"], 0)[:n]
        return result
