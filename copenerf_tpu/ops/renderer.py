"""NeuS-style differentiable volume renderer, TPU-first.

Functionally mirrors ``/root/reference/model/neus_renderer.py`` (class
``NeuSRenderer``, :107-592) but is a single pure function designed for jit:

  * all sample counts static; the 4-round up-sampling loop unrolls to fixed
    shapes (64 -> 80 -> 96 -> 112 -> 128);
  * SDF normals + time-derivative ("sdf flow") via one fused query
    (``sdf_output_and_gradient``) — a Pallas kernel with a hand-derived
    second-order VJP on TPU, reverse-mode AD elsewhere — instead of the
    reference's autograd-in-forward;
  * importance sampling runs under ``stop_gradient`` (the reference uses
    ``torch.no_grad``, :493);
  * stratified-noise PRNG is threaded explicitly (keys, not global state).

Quirks intentionally reproduced from the reference: the ``inside_sphere``
mask is computed then overwritten with ones (:185-187, :387-389); background
blending of ``render_core`` is disabled (commented out upstream, :391-403);
``n_max_network_queries`` and ``perturb`` are accepted but unused (:118,133).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.fields import (color_apply, nerf_apply, sdf_apply,
                             sdf_grad_color, sdf_grad_color_cons,
                             sdf_output_and_gradient,
                             sdf_value,
                             sdf_value_nograd, sdf_with_gradient,
                             variance_inv_s)
from .sampling import (_exclusive_transmittance, cat_z_vals, up_sample,
                       up_sample_naive)


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 0
    up_sample_steps: int = 4
    perturb: float = 1.0
    n_max_network_queries: int = 64000
    importance_sampling_start: int = 0
    naive_render: bool = False

    @staticmethod
    def from_cfg(cfg: dict) -> "RendererConfig":
        c = cfg["neus_renderer"]
        return RendererConfig(
            n_samples=c["n_samples"], n_importance=c["n_importance"],
            n_outside=c["n_outside"], up_sample_steps=c["up_sample_steps"],
            perturb=c["perturb"],
            n_max_network_queries=c["n_max_network_queries"],
            importance_sampling_start=c["importance_sampling_start"],
            naive_render=c["naive_render"])


def _with_time(pts: jnp.ndarray, time_step) -> jnp.ndarray:
    """Append the scalar time step as a 4th coordinate: (..., 3) -> (..., 4)."""
    t = jnp.broadcast_to(jnp.reshape(time_step, (1,) * (pts.ndim - 1) + (1,)),
                         pts.shape[:-1] + (1,))
    return jnp.concatenate([pts, t], axis=-1)


def render_core_outside(nerf_cfg, nerf_params, rays_o, rays_d, z_vals,
                        sample_dist, background_rgb=None):
    """Background NeRF++ path (reference :137-176). Inactive by default
    (n_outside == 0) but kept for API parity."""
    batch_size, n_samples = z_vals.shape
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1)
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]
    dis = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis, 1.0 / dis], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    density, color = nerf_apply(nerf_cfg, nerf_params, pts4, dirs)
    color = jax.nn.sigmoid(color)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density[..., 0]) * dists)
    weights = alpha * _exclusive_transmittance(alpha, eps=1e-6)
    out_color = jnp.sum(weights[..., None] * color, axis=1)
    if background_rgb is not None:
        out_color = out_color + background_rgb * (
            1.0 - jnp.sum(weights, -1, keepdims=True))
    return {"color": out_color, "sampled_color": color, "alpha": alpha,
            "weights": weights}


def render_core(field_cfgs, params, rays_o, rays_d, rays_d_norm, time_step,
                z_vals, sample_dist, cos_anneal_ratio, *, eval_depth: bool,
                cons=None):
    """Reference ``render_core`` (:307-450): SDF -> alpha (NeuS eq. 13) ->
    transmittance-weighted compositing of color/depth/normals.

    ``cons``: optional ``(cw2 (4, 4), world_time scalar)`` — the
    sdf-consistency world transform (reference train.py:495-505). When
    given, the value-only SDF re-query at the transformed points is FOLDED
    into the field-query kernel launch (one weight residency, one
    gradient-accumulation stream) and returned as ``sdf_world``.
    """
    batch_size, n_samples = z_vals.shape

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], sample_dist)], axis=-1)
    mid_z = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    pts_time = _with_time(pts, time_step)                      # (B, S, 4)

    # One fused query for value+gradient+color. d(sdf)/d(x, y, z, t) has
    # its input-dependence severed: the reference detaches pts_time before
    # autograd.grad (:356), so no gradient flows to ray origins/poses
    # through the normal path. On TPU sdf+gradient+color run as ONE Pallas
    # kernel (the 256-wide feature never leaves VMEM); elsewhere the
    # composed XLA ops serve as the oracle (models/fields.sdf_grad_color).
    sdf_world = None
    if cons is not None:
        cw2, world_time = cons
        pts_world = pts @ cw2[:3, :3].T + cw2[:3, 3]
        pts_world_time = _with_time(pts_world, world_time)
        sdf, gradients, sampled_color, sdf_world = sdf_grad_color_cons(
            field_cfgs["sdf"], field_cfgs["color"], params["sdf"],
            params["color"], pts_time, dirs, pts_world_time)
    else:
        sdf, gradients, sampled_color = sdf_grad_color(
            field_cfgs["sdf"], field_cfgs["color"], params["sdf"],
            params["color"], pts_time, dirs)
    normals = gradients[..., :3]
    sdf_flows = gradients[..., 3:]

    inv_s = jnp.clip(variance_inv_s(params["variance"]), 1e-3, 1e3)

    true_cos = jnp.sum(dirs * normals, axis=-1, keepdims=True)
    # Cos annealing keeps alpha alive early in training (reference :367-370).
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)

    est_next = sdf + iter_cos * dists[..., None] * 0.5
    est_prev = sdf - iter_cos * dists[..., None] * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip(((prev_cdf - next_cdf + 1e-5) /
                      (prev_cdf + 1e-5))[..., 0], 0.0, 1.0)

    weights = alpha * _exclusive_transmittance(alpha)
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)

    color = jnp.sum(sampled_color * weights[..., None], axis=1)
    depth_pred = jnp.sum(z_vals * weights, axis=1, keepdims=True)
    weighted_z_vals = jax.lax.stop_gradient(depth_pred)
    if eval_depth:
        # Convert distance-along-ray to z-depth for GT-depth comparison.
        depth_pred = depth_pred / rays_d_norm

    return {
        "color": color,
        "depth_pred": depth_pred,
        "weighted_z_vals": weighted_z_vals,
        "sdf": sdf.reshape(batch_size, n_samples),
        "dists": dists,
        "normals": normals,
        "sdf_flows": sdf_flows,
        "sampled_points": pts,
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z,
        "weights": weights,
        "cdf": prev_cdf[..., 0],
        "weight_sum": weights_sum,
        **({"sdf_world": sdf_world.reshape(batch_size, n_samples)}
           if sdf_world is not None else {}),
    }


def render(field_cfgs, params, rays_o, rays_d, rays_d_norm, time_step, near,
           far, *, rcfg: RendererConfig, cos_anneal_ratio,
           use_importance: bool = True, train: bool = True,
           key=None, t_rand=None, background_rgb=None, cons=None):
    """Full render pass (reference ``NeuSRenderer.forward``, :453-584).

    Static args: ``rcfg``, ``use_importance`` (the reference's
    ``it >= importance_sampling_start``), ``train`` (stratified noise on,
    depth stays distance-along-ray).

    ``key`` supplies stratified-jitter randomness when training;
    ``t_rand`` overrides it for golden tests against the torch oracle.
    """
    batch_size = rays_o.shape[0]
    if use_importance:
        n_samples, n_importance = rcfg.n_samples, rcfg.n_importance
    else:
        n_samples, n_importance = rcfg.n_samples + rcfg.n_importance, 0

    sample_dist = (far[0, 0] - near[0, 0]) / n_samples
    t = jnp.linspace(0.0, 1.0, n_samples)
    z_vals = near * (1.0 - t[None, :]) + far * t[None, :]

    if train:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        if t_rand is None:
            t_rand = jax.random.uniform(key, (batch_size, n_samples))
        z_vals = lower + (upper - lower) * t_rand

    if n_importance > 0:
        def query_sdf(pts_t):
            # Auto-routes to the fused Pallas value kernel on TPU.
            return sdf_value_nograd(field_cfgs["sdf"], params["sdf"], pts_t)

        # Importance pre-sampling is gradient-free (reference no_grad :493).
        z_vals = jax.lax.stop_gradient(z_vals)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        sdf = jax.lax.stop_gradient(query_sdf(_with_time(pts, time_step)))
        n_per_step = n_importance // rcfg.up_sample_steps
        for i in range(rcfg.up_sample_steps):
            up_fn = up_sample_naive if rcfg.naive_render else up_sample
            new_z = up_fn(rays_o, rays_d, z_vals, sdf, n_per_step,
                          64.0 * 2 ** i)
            last = (i + 1) == rcfg.up_sample_steps
            if last:
                z_vals, sdf, _ = cat_z_vals(z_vals, new_z, sdf, None)
            else:
                new_pts = (rays_o[:, None, :] +
                           rays_d[:, None, :] * new_z[..., None])
                new_sdf = jax.lax.stop_gradient(
                    query_sdf(_with_time(new_pts, time_step)))
                z_vals, sdf, _ = cat_z_vals(z_vals, new_z, sdf, new_sdf)
        n_samples = n_samples + n_importance

    if rcfg.n_outside > 0:
        z_out = jnp.linspace(1e-3, 1.0 - 1.0 / (rcfg.n_outside + 1.0),
                             rcfg.n_outside)
        z_out = far / jnp.flip(z_out, -1) + 1.0 / rcfg.n_samples
        z_feed = jnp.sort(jnp.concatenate([z_vals, z_out], axis=-1), axis=-1)
        bg = render_core_outside(field_cfgs["nerf"], params["nerf"], rays_o,
                                 rays_d, z_feed, sample_dist, background_rgb)
        del bg  # blending disabled upstream (:391-403); kept for parity hooks

    ret = render_core(field_cfgs, params, rays_o, rays_d, rays_d_norm,
                      time_step, z_vals, sample_dist, cos_anneal_ratio,
                      eval_depth=not train, cons=cons)

    weights = ret["weights"]
    if background_rgb is not None:
        ret["color"] = ret["color"] + background_rgb * (1.0 - ret["weight_sum"])
    return {
        "sdf": ret["sdf"],
        "color_fine": ret["color"],
        "depth_pred": ret["depth_pred"],
        "weighted_z_vals": ret["weighted_z_vals"],
        "s_val": jnp.broadcast_to(ret["s_val"], (batch_size, 1)),
        "cdf_fine": ret["cdf"],
        "weight_sum": ret["weight_sum"],
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "normals": ret["normals"],
        "sdf_flows": ret["sdf_flows"],
        "sampled_points": ret["sampled_points"],
        "weights": weights,
        "mid_z_vals": ret["mid_z_vals"],
        **({"sdf_world": ret["sdf_world"]} if "sdf_world" in ret else {}),
    }
