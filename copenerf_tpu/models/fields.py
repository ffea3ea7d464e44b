"""Field networks as pure-functional (config, params, apply) triples.

Re-implements, with identical math, the five networks of the reference
(``/root/reference/model/neus_fields.py``):

  * ``SDFNetwork``   (:205-303)  — time-conditioned SDF, IDR geometric init,
    weight norm, Softplus(beta=100), skip connection.
  * ``RenderingNetwork`` (:307-374) — IDR-style color head.
  * ``SingleVarianceNetwork`` (:459-465) — learnable inv_s = exp(10 v).
  * ``NeRF``          (:378-456) — nerf-pytorch background MLP.
  * ``MotionNetwork`` (:79-201)  — t -> (angular velocity, linear velocity).

Params are plain nested dicts (pytrees); configs are frozen dataclasses so the
apply fns are jit-static. SDF spatial gradients are computed in
``copenerf_tpu/ops/renderer.py`` via forward-mode AD instead of the reference's
autograd-inside-forward (:291-303).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .embedder import embed_dim, positional_encoding
from .mlp import linear_apply, make_linear, softplus


# ---------------------------------------------------------------------------
# SDF network (shared skeleton with MotionNetwork: IDR MLP with skip concat)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SDFConfig:
    d_in: int = 4
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Tuple[int, ...] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False

    @property
    def dims(self) -> Tuple[int, ...]:
        d0 = embed_dim(self.multires, self.d_in) if self.multires > 0 else self.d_in
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def _idr_layer_dims(cfg, l: int) -> Tuple[int, int]:
    dims = cfg.dims
    out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
    return dims[l], out_dim


def sdf_init(key, cfg: SDFConfig) -> dict:
    """IDR geometric initialization (reference :241-259) + weight norm."""
    params = {}
    num_layers = len(cfg.dims)
    keys = jax.random.split(key, num_layers - 1)
    for l in range(num_layers - 1):
        d_in_l, d_out_l = _idr_layer_dims(cfg, l)
        if not cfg.geometric_init:
            params[f"lin{l}"] = make_linear(
                keys[l], d_in_l, d_out_l, cfg.weight_norm, "torch_default")
            continue
        if l == num_layers - 2:
            sign = -1.0 if cfg.inside_outside else 1.0
            params[f"lin{l}"] = make_linear(
                keys[l], d_in_l, d_out_l, cfg.weight_norm, "normal",
                mean=sign * np.sqrt(np.pi) / np.sqrt(d_in_l), std=1e-4,
                bias_const=-sign * cfg.bias)
        elif cfg.multires > 0 and l == 0:
            # Raw (x, y, z, t) channels get the kaiming draw; PE channels zero.
            p = make_linear(keys[l], d_in_l, d_out_l, cfg.weight_norm, "normal",
                            std=np.sqrt(2) / np.sqrt(d_out_l),
                            zero_in_cols=slice(cfg.d_in, None))
            params[f"lin{l}"] = p
        elif cfg.multires > 0 and l in cfg.skip_in:
            # Skip layer: zero the PE part of the concatenated raw input.
            n_zero = cfg.dims[0] - cfg.d_in
            params[f"lin{l}"] = make_linear(
                keys[l], d_in_l, d_out_l, cfg.weight_norm, "normal",
                std=np.sqrt(2) / np.sqrt(d_out_l),
                zero_in_cols=slice(d_in_l - n_zero, None))
        else:
            params[f"lin{l}"] = make_linear(
                keys[l], d_in_l, d_out_l, cfg.weight_norm, "normal",
                std=np.sqrt(2) / np.sqrt(d_out_l))
    return params


def sdf_apply(cfg: SDFConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 257): sdf value (scale-corrected) + feature vector."""
    inputs = x * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    h = inputs
    num_layers = len(cfg.dims)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for l in range(num_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
        h = linear_apply(params[f"lin{l}"], h)
        if l < num_layers - 2:
            h = softplus(h, beta=100.0)
    return jnp.concatenate([h[..., :1] / cfg.scale, h[..., 1:]], axis=-1)


def sdf_value(cfg: SDFConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return sdf_apply(cfg, params, x)[..., :1]


def sdf_with_gradient(cfg: SDFConfig, params: dict, x: jnp.ndarray):
    """Return (sdf+feature, d(sdf)/dx) for (..., 4) inputs via reverse-mode AD.

    Replaces the reference's ``torch.autograd.grad(create_graph=True)`` inside
    forward (:291-303). The SDF head is scalar per point, so ONE reverse pass
    yields the full 4-D input gradient — ~2x the forward cost, vs ~5x for the
    4-tangent forward-mode Jacobian (and ~3x cheaper again under the outer
    parameter gradient, where the eikonal term makes this second-order AD).
    XLA CSEs the primal trunk with the plain ``sdf_apply`` forward.
    """
    out = sdf_apply(cfg, params, x)
    grads = jax.grad(
        lambda xx: jnp.sum(sdf_apply(cfg, params, xx)[..., 0]))(x)
    return out, grads


# ---------------------------------------------------------------------------
# Fused Pallas routing: on TPU the hot-path SDF queries run as fused kernels
# (ops/pallas/sdf_kernels.py); everywhere else the plain-jnp paths above are
# the oracle. "auto" enables the kernels on tpu/axon backends only.
# ---------------------------------------------------------------------------

_FUSED_SDF_MODE = "auto"  # "auto" | "on" | "off"


def set_fused_sdf(mode: str) -> None:
    global _FUSED_SDF_MODE
    assert mode in ("auto", "on", "off"), mode
    _FUSED_SDF_MODE = mode


def fused_sdf_enabled() -> bool:
    if _FUSED_SDF_MODE == "auto":
        from ..ops.pallas.sdf_kernels import is_tpu_backend
        return is_tpu_backend()
    return _FUSED_SDF_MODE == "on"


# The fused color kernel is opt-in (never 'auto'): inside the train step it
# measured slower than XLA despite winning standalone — see color_apply.
_FUSED_COLOR_MODE = "off"  # "on" | "off"


def set_fused_color(mode: str) -> None:
    global _FUSED_COLOR_MODE
    assert mode in ("on", "off"), mode
    _FUSED_COLOR_MODE = mode


def _fused_color_enabled() -> bool:
    return _FUSED_COLOR_MODE == "on"


# Value-only paths carry far less VMEM state than the second-order outgrad
# kernel, so they run at a larger row tile (v5e: the consistency-loss
# value_diff fwd+bwd at 131k pts measures 6.51 ms at tile 256 vs 5.55 at
# 512). The outgrad path stays at the sdf_kernels default.
_VALUE_TILE = 512


def sdf_value_nograd(cfg: SDFConfig, params: dict, x: jnp.ndarray):
    """SDF value only, for stop-gradient regions (importance sweeps,
    marching-cubes grids). Shape (..., 4) -> (...,)."""
    if fused_sdf_enabled():
        from ..ops.pallas.sdf_kernels import get_fused_ops
        return get_fused_ops(cfg, tile=_VALUE_TILE).value(params, x)
    return sdf_apply(cfg, params, x)[..., 0]


def sdf_output(cfg: SDFConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., d_out) with first-order AD (fused kernel on TPU)."""
    if fused_sdf_enabled():
        from ..ops.pallas.sdf_kernels import get_fused_ops
        return get_fused_ops(cfg).out(params, x)
    return sdf_apply(cfg, params, x)


def sdf_scalar(cfg: SDFConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable SDF value only: (..., 4) -> (...,).

    For losses that never touch the feature head (sdf-consistency,
    train.py:495-505): the fused value-only kernel skips the 256-wide output
    matmul and its backward sweeps (~30% fewer FLOPs than ``sdf_output``)."""
    if fused_sdf_enabled():
        from ..ops.pallas.sdf_kernels import get_fused_ops
        return get_fused_ops(cfg, tile=_VALUE_TILE).value_diff(params, x)
    return sdf_apply(cfg, params, x)[..., 0]


def sdf_grad_color(sdf_cfg: SDFConfig, color_cfg, params_sdf: dict,
                   params_color: dict, x: jnp.ndarray, dirs: jnp.ndarray):
    """The render-core field query: (sdf, gradient, sampled color) for one
    batch of (..., 4) pts_time and (..., 3) view dirs.

    On TPU with fused kernels and the reference's default color config
    (idr mode, positive ray vector) this is ONE Pallas op — SDF forward +
    input gradient + color MLP fused, the 256-wide feature never leaving
    VMEM (ops/pallas/rendercore_kernels.py). Otherwise it composes
    ``sdf_output_and_gradient`` + ``color_apply`` (the correctness oracle).
    Covers the reference hot sequence ``model/neus_renderer.py:352-358``.
    """
    if (fused_sdf_enabled() and color_cfg.mode == "idr"
            and not color_cfg.use_negative_ray_vector):
        from ..ops.pallas.rendercore_kernels import get_fused_rendercore
        return get_fused_rendercore(sdf_cfg, color_cfg)(
            params_sdf, params_color, x, dirs)
    out, grad = sdf_output_and_gradient(sdf_cfg, params_sdf, x)
    color = color_apply(color_cfg, params_color, x, grad, dirs,
                        out[..., 1:])
    return out[..., :1], grad, color


def sdf_grad_color_cons(sdf_cfg, color_cfg, params_sdf: dict,
                        params_color: dict, x: jnp.ndarray,
                        dirs: jnp.ndarray, y: jnp.ndarray):
    """``sdf_grad_color`` with the sdf-consistency re-query FOLDED IN:
    also evaluates the differentiable SDF value at the world-transformed
    batch ``y`` (reference train.py:495-505) and returns it as a fourth
    output ``sdf_w (...,)``.

    Routing (v5e, measured — benchmarks/micro_rendercore.py): the fully
    FOLDED single-launch variant (get_fused_rendercore_cons: value query
    inside the render-core kernel, one weight residency, one gradient
    accumulation stream) is NET-NEGATIVE on this generation — 19.8-21.6 ms
    vs 19.5 ms for render-core kernel + separate value_diff kernel at
    131k pts fwd+bwd across the (256..512)^2 tile grid: the extra
    activation stacks inflate the backward's VMEM working set more than
    the saved launch costs. The composition below therefore routes each
    piece to its own fused kernel (sdf_grad_color -> render-core kernel,
    sdf_scalar -> value_diff kernel); set COPENERF_FOLD_CONS=1 to use the
    folded kernel (kept tested for future hardware where the tradeoff may
    flip). On non-TPU backends everything composes to the XLA oracle.
    """
    if (fused_sdf_enabled() and color_cfg.mode == "idr"
            and not color_cfg.use_negative_ray_vector
            and os.environ.get("COPENERF_FOLD_CONS") == "1"):
        from ..ops.pallas.rendercore_kernels import get_fused_rendercore_cons
        return get_fused_rendercore_cons(sdf_cfg, color_cfg)(
            params_sdf, params_color, x, dirs, y)
    sdf, grad, color = sdf_grad_color(sdf_cfg, color_cfg, params_sdf,
                                      params_color, x, dirs)
    sdf_w = sdf_scalar(sdf_cfg, params_sdf, y)
    return sdf, grad, color, sdf_w


def sdf_output_and_gradient(cfg: SDFConfig, params: dict, x: jnp.ndarray):
    """Hot-path combo with reference semantics: returns (out, grad) where
    ``out`` is differentiable w.r.t. ``x`` but ``grad``'s x-dependence is
    severed (the reference detaches pts before ``gradient()``,
    neus_renderer.py:356). Second-order AD (eikonal) supported on both paths;
    on TPU this is ONE fused kernel with a hand-derived double-backprop VJP.
    """
    if fused_sdf_enabled():
        from ..ops.pallas.sdf_kernels import get_fused_ops
        return get_fused_ops(cfg).outgrad(params, x)
    out = sdf_apply(cfg, params, x)
    _, grads = sdf_with_gradient(cfg, params, jax.lax.stop_gradient(x))
    return out, grads


# ---------------------------------------------------------------------------
# Motion network: t -> (omega, v)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MotionConfig:
    d_in: int = 1
    d_out: int = 6
    d_hidden: int = 256
    n_layers: int = 4
    skip_in: Tuple[int, ...] = (2,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = False
    weight_norm: bool = True
    inside_outside: bool = False

    @property
    def dims(self) -> Tuple[int, ...]:
        d0 = embed_dim(self.multires, self.d_in) if self.multires > 0 else self.d_in
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def motion_init(key, cfg: MotionConfig) -> dict:
    """Default (non-geometric) init per the reference config
    (``motion_network.geometric_init: False``)."""
    params = {}
    num_layers = len(cfg.dims)
    keys = jax.random.split(key, num_layers - 1)
    for l in range(num_layers - 1):
        d_in_l, d_out_l = _idr_layer_dims(cfg, l)
        params[f"lin{l}"] = make_linear(
            keys[l], d_in_l, d_out_l, cfg.weight_norm, "torch_default")
    return params


def motion_apply(cfg: MotionConfig, params: dict, t: jnp.ndarray):
    """(..., 1) time -> ((..., 3) angular velocity, (..., 3) velocity).

    Note: unlike the SDF net, the *input* is not scaled; the *output* is
    (reference :185-201).
    """
    inputs = t
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    h = inputs
    num_layers = len(cfg.dims)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for l in range(num_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
        h = linear_apply(params[f"lin{l}"], h)
        if l < num_layers - 2:
            h = jax.nn.leaky_relu(h, negative_slope=0.2)
    h = h * cfg.scale
    return h[..., :3], h[..., 3:]


# ---------------------------------------------------------------------------
# Rendering (color) network
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ColorConfig:
    d_feature: int = 256
    mode: str = "idr"
    d_in: int = 11
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multires_view: int = 4
    squeeze_out: bool = True
    use_negative_ray_vector: bool = False

    @property
    def dims(self) -> Tuple[int, ...]:
        d0 = self.d_in + self.d_feature
        if self.multires_view > 0:
            d0 += embed_dim(self.multires_view, 3) - 3
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def color_init(key, cfg: ColorConfig) -> dict:
    params = {}
    dims = cfg.dims
    keys = jax.random.split(key, len(dims) - 1)
    for l in range(len(dims) - 1):
        params[f"lin{l}"] = make_linear(
            keys[l], dims[l], dims[l + 1], cfg.weight_norm, "torch_default")
    return params


def color_apply(cfg: ColorConfig, params: dict, points, normals, view_dirs,
                feature_vectors) -> jnp.ndarray:
    """points=(...,4) pts_time, normals=(...,4) [n, sdf_flow], dirs=(...,3)."""
    if cfg.use_negative_ray_vector:
        view_dirs = -view_dirs
        normals = -normals
    if cfg.mode == "idr" and _fused_color_enabled():
        # Fused Pallas path (OPT-IN, see _FUSED_COLOR_MODE): concatenates the
        # four components in VMEM. Measured STANDALONE 2x faster than XLA
        # (5.3 vs 10.2 ms fwd+bwd at 131k pts, v5e) but ~0.8 ms SLOWER inside
        # the full train step, where XLA fuses the color chain into the
        # surrounding graph (compositing cotangents in, sdf-kernel outputs
        # out) and the opaque custom call severs those fusions. Kept for
        # contexts without that surrounding graph.
        from ..ops.pallas.color_kernels import get_fused_color
        return get_fused_color(cfg)(params, points, view_dirs, normals,
                                    feature_vectors)
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.mode == "idr":
        h = jnp.concatenate([points, view_dirs, normals, feature_vectors], -1)
    elif cfg.mode == "no_view_dir":
        h = jnp.concatenate([points, normals, feature_vectors], -1)
    elif cfg.mode == "no_normal":
        h = jnp.concatenate([points, view_dirs, feature_vectors], -1)
    else:
        raise ValueError(cfg.mode)
    num_layers = len(cfg.dims)
    for l in range(num_layers - 1):
        h = linear_apply(params[f"lin{l}"], h)
        if l < num_layers - 2:
            h = jax.nn.relu(h)
    if cfg.squeeze_out:
        h = jax.nn.sigmoid(h)
    return h


# ---------------------------------------------------------------------------
# Deviation (single-variance) network
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VarianceConfig:
    init_val: float = 0.3


def variance_init(cfg: VarianceConfig) -> dict:
    return {"variance": jnp.asarray(cfg.init_val, jnp.float32)}


def variance_inv_s(params: dict) -> jnp.ndarray:
    """inv_s = exp(10 v); callers clip to [1e-3, 1e3] at the use site
    (reference ``model/neus_renderer.py:360``)."""
    return jnp.exp(params["variance"] * 10.0)


# ---------------------------------------------------------------------------
# Background NeRF (nerf-pytorch MLP)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NerfConfig:
    D: int = 8
    W: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    output_ch: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True

    @property
    def input_ch(self) -> int:
        return embed_dim(self.multires, self.d_in) if self.multires > 0 else 3

    @property
    def input_ch_view(self) -> int:
        return (embed_dim(self.multires_view, self.d_in_view)
                if self.multires_view > 0 else 3)


def nerf_init(key, cfg: NerfConfig) -> dict:
    params = {}
    n_keys = cfg.D + 4
    keys = jax.random.split(key, n_keys)
    d_prev = cfg.input_ch
    for i in range(cfg.D):
        params[f"pts{i}"] = make_linear(keys[i], d_prev, cfg.W, False,
                                        "torch_default")
        # nerf-pytorch concatenates [input_pts, h] AFTER layer i in skips.
        d_prev = cfg.W + cfg.input_ch if i in cfg.skips else cfg.W
    params["views0"] = make_linear(keys[cfg.D], cfg.input_ch_view + cfg.W,
                                   cfg.W // 2, False, "torch_default")
    params["feature"] = make_linear(keys[cfg.D + 1], cfg.W, cfg.W, False,
                                    "torch_default")
    params["alpha"] = make_linear(keys[cfg.D + 2], cfg.W, 1, False,
                                  "torch_default")
    params["rgb"] = make_linear(keys[cfg.D + 3], cfg.W // 2, 3, False,
                                "torch_default")
    return params


def nerf_apply(cfg: NerfConfig, params: dict, input_pts, input_views):
    """(..., d_in) points, (..., 3) dirs -> (alpha (...,1), rgb (...,3))."""
    if cfg.multires > 0:
        input_pts = positional_encoding(input_pts, cfg.multires)
    if cfg.multires_view > 0:
        input_views = positional_encoding(input_views, cfg.multires_view)
    h = input_pts
    for i in range(cfg.D):
        h = jax.nn.relu(linear_apply(params[f"pts{i}"], h))
        if i in cfg.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    if not cfg.use_viewdirs:
        raise NotImplementedError("reference asserts use_viewdirs")
    alpha = linear_apply(params["alpha"], h)
    feature = linear_apply(params["feature"], h)
    h = jnp.concatenate([feature, input_views], axis=-1)
    h = jax.nn.relu(linear_apply(params["views0"], h))
    rgb = linear_apply(params["rgb"], h)
    return alpha, rgb


# ---------------------------------------------------------------------------
# Config constructors from the YAML dicts
# ---------------------------------------------------------------------------

def configs_from_cfg(cfg: dict):
    """Build all field configs from a merged YAML config dict."""
    def _tup(x):
        return tuple(x) if isinstance(x, (list, tuple)) else (x,)

    sdf_c = cfg["neus_sdf_network"]
    mot_c = cfg["motion_network"]
    col_c = cfg["neus_rendering_network"]
    nerf_c = cfg["neus_nerf"]
    var_c = cfg["neus_variance_network"]
    return {
        "sdf": SDFConfig(
            d_in=sdf_c["d_in"], d_out=sdf_c["d_out"], d_hidden=sdf_c["d_hidden"],
            n_layers=sdf_c["n_layers"], skip_in=_tup(sdf_c["skip_in"]),
            multires=sdf_c["multires"], bias=sdf_c["bias"], scale=sdf_c["scale"],
            geometric_init=sdf_c["geometric_init"],
            weight_norm=sdf_c["weight_norm"]),
        "motion": MotionConfig(
            d_in=mot_c["d_in"], d_out=mot_c["d_out"], d_hidden=mot_c["d_hidden"],
            n_layers=mot_c["n_layers"], skip_in=_tup(mot_c["skip_in"]),
            multires=mot_c["multires"], bias=mot_c["bias"], scale=mot_c["scale"],
            geometric_init=mot_c["geometric_init"],
            weight_norm=mot_c["weight_norm"]),
        "color": ColorConfig(
            d_feature=col_c["d_feature"], mode=col_c["mode"], d_in=col_c["d_in"],
            d_out=col_c["d_out"], d_hidden=col_c["d_hidden"],
            n_layers=col_c["n_layers"], weight_norm=col_c["weight_norm"],
            multires_view=col_c["multires_view"],
            squeeze_out=col_c["squeeze_out"],
            use_negative_ray_vector=col_c["use_negative_ray_vector"]),
        "nerf": NerfConfig(
            D=nerf_c["D"], W=nerf_c["W"], d_in=nerf_c["d_in"],
            d_in_view=nerf_c["d_in_view"], multires=nerf_c["multires"],
            multires_view=nerf_c["multires_view"],
            output_ch=nerf_c["output_ch"], skips=_tup(nerf_c["skips"]),
            use_viewdirs=nerf_c["use_viewdirs"]),
        "variance": VarianceConfig(init_val=var_c["init_val"]),
    }


def init_all_fields(key, configs: dict) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "sdf": sdf_init(k1, configs["sdf"]),
        "motion": motion_init(k2, configs["motion"]),
        "color": color_init(k3, configs["color"]),
        "nerf": nerf_init(k4, configs["nerf"]),
        "variance": variance_init(configs["variance"]),
    }
