"""Parity tests for the fused Pallas SDF kernels (interpret mode on CPU).

The kernels are validated in f32 against the plain-jnp oracle
(``models.fields``): forward values, the fused input gradient, first-order
parameter/input gradients, and the hand-derived SECOND-ORDER backward
(double backprop for the eikonal-style terms). A bf16 smoke test bounds the
low-precision error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import copenerf_tpu.ops.pallas.sdf_kernels as K
from copenerf_tpu.models.fields import (SDFConfig, sdf_apply, sdf_init,
                                        sdf_with_gradient)

CFG = SDFConfig(d_in=4, d_out=33, d_hidden=64, n_layers=4, skip_in=(2,),
                multires=3, bias=0.5, scale=1.3, geometric_init=True,
                weight_norm=True)


@pytest.fixture(scope="module")
def setup():
    params = sdf_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (40, 4))
    return params, x


def _ops(dtype):
    K._COMPUTE_DTYPE = dtype
    K._get_fused_ops.cache_clear()
    K._build.cache_clear()
    return K.get_fused_ops(CFG, tile=8, interpret=True)


def test_forward_parity_f32(setup):
    params, x = setup
    ops = _ops(jnp.float32)
    np.testing.assert_allclose(ops.value(params, x),
                               sdf_apply(CFG, params, x)[..., 0],
                               rtol=0, atol=2e-6)
    o_ref, g_ref = sdf_with_gradient(CFG, params, x)
    np.testing.assert_allclose(ops.out(params, x), o_ref, rtol=0, atol=5e-6)
    o, g = ops.outgrad(params, x)
    np.testing.assert_allclose(o, o_ref, rtol=0, atol=5e-6)
    np.testing.assert_allclose(g, g_ref, rtol=0, atol=5e-6)
    np.testing.assert_allclose(ops.value_diff(params, x), o_ref[..., 0],
                               rtol=0, atol=5e-6)


def test_forward_nonmultiple_tile_padding(setup):
    params, _ = setup
    ops = _ops(jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (13, 4))  # pads 13 -> 16
    np.testing.assert_allclose(ops.value(params, x),
                               sdf_apply(CFG, params, x)[..., 0],
                               rtol=0, atol=2e-6)


def test_first_order_backward(setup):
    params, x = setup
    ops = _ops(jnp.float32)

    def loss_k(p, xx):
        return jnp.sum(jnp.sin(ops.out(p, xx)))

    def loss_r(p, xx):
        return jnp.sum(jnp.sin(sdf_apply(CFG, p, xx)))

    gk = jax.grad(loss_k)(params, x)
    gr = jax.grad(loss_r)(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
    gxk = jax.grad(lambda xx: loss_k(params, xx))(x)
    gxr = jax.grad(lambda xx: loss_r(params, xx))(x)
    np.testing.assert_allclose(gxk, gxr, rtol=2e-5, atol=2e-5)


def test_value_only_first_order_backward(setup):
    """The value-only op's params/x gradients equal the full op's for a loss
    that touches only the SDF head (the sdf-consistency shape)."""
    params, x = setup
    ops = _ops(jnp.float32)

    def loss_k(p, xx):
        return jnp.mean(jnp.abs(ops.value_diff(p, xx) - 0.07))

    def loss_r(p, xx):
        return jnp.mean(jnp.abs(sdf_apply(CFG, p, xx)[..., 0] - 0.07))

    gk = jax.grad(loss_k)(params, x)
    gr = jax.grad(loss_r)(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
    gxk = jax.grad(lambda xx: loss_k(params, xx))(x)
    gxr = jax.grad(lambda xx: loss_r(params, xx))(x)
    np.testing.assert_allclose(gxk, gxr, rtol=2e-5, atol=2e-5)


def _loss_pair():
    """(kernel_loss, reference_loss) with eikonal-style second-order terms
    and the reference's severed-gradient semantics."""
    def loss_k(outgrad_fn, p, xx):
        out, g = outgrad_fn(p, xx)
        return (jnp.mean(jnp.abs(out[..., 0]))
                + 0.3 * jnp.mean(jnp.sin(out[..., 1:]))
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1.0) ** 2)
                + 0.2 * jnp.mean(g[..., 3] ** 2))

    def loss_r(p, xx):
        out = sdf_apply(CFG, p, xx)
        _, g = sdf_with_gradient(CFG, p, jax.lax.stop_gradient(xx))
        return (jnp.mean(jnp.abs(out[..., 0]))
                + 0.3 * jnp.mean(jnp.sin(out[..., 1:]))
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1.0) ** 2)
                + 0.2 * jnp.mean(g[..., 3] ** 2))
    return loss_k, loss_r


def test_second_order_backward(setup):
    params, x = setup
    outgrad_fn = _ops(jnp.float32).outgrad
    loss_k, loss_r = _loss_pair()
    gk = jax.grad(lambda p: loss_k(outgrad_fn, p, x))(params)
    gr = jax.grad(lambda p: loss_r(p, x))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=3e-5)
    # x gradient: value path only (grad path severed)
    gxk = jax.grad(lambda xx: loss_k(outgrad_fn, params, xx))(x)
    gxr = jax.grad(lambda xx: loss_r(params, xx))(x)
    np.testing.assert_allclose(gxk, gxr, rtol=2e-4, atol=2e-4)


def test_second_order_backward_bf16_bounded(setup):
    params, x = setup
    outgrad_fn = _ops(jnp.bfloat16).outgrad
    loss_k, loss_r = _loss_pair()
    gk = jax.grad(lambda p: loss_k(outgrad_fn, p, x))(params)
    gr = jax.grad(lambda p: loss_r(p, x))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 0.2, f"bf16 second-order error too large: {err}"
    K._COMPUTE_DTYPE = jnp.float32  # restore module default


def test_color_kernel_parity():
    """Fused color kernel (interpret) vs the XLA color_apply oracle:
    forward, parameter grads, and grads w.r.t. every input."""
    from copenerf_tpu.models import fields as F
    from copenerf_tpu.ops.pallas.color_kernels import get_fused_color

    ccfg = F.ColorConfig(d_feature=32, d_in=11, d_hidden=48, n_layers=3,
                         multires_view=4, weight_norm=True, squeeze_out=True)
    params = F.color_init(jax.random.PRNGKey(0), ccfg)
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    pts = jax.random.normal(k[0], (20, 4))
    dirs = jax.random.normal(k[1], (20, 3))
    grads = jax.random.normal(k[2], (20, 4))
    feat = jax.random.normal(k[3], (20, 32))
    color_fn = get_fused_color(ccfg, tile=8, interpret=True)

    c_k = color_fn(params, pts, dirs, grads, feat)
    # NB color_apply's argument order is (points, normals, view_dirs, feat).
    c_r = F.color_apply(ccfg, params, pts, grads, dirs, feat)
    np.testing.assert_allclose(c_k, c_r, rtol=0, atol=5e-6)

    def loss_k(p, x, d, g, f):
        return jnp.sum(jnp.sin(3.0 * color_fn(p, x, d, g, f)))

    def loss_r(p, x, d, g, f):
        return jnp.sum(jnp.sin(3.0 * F.color_apply(ccfg, p, x, g, d, f)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(params, pts, dirs, grads,
                                                   feat)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(params, pts, dirs, grads,
                                                   feat)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_color_kernel_negative_ray_and_routing():
    """color_apply with fused mode forced on equals the plain path, including
    the use_negative_ray_vector flip."""
    from copenerf_tpu.models import fields as F

    ccfg = F.ColorConfig(d_feature=16, d_in=11, d_hidden=32, n_layers=2,
                         multires_view=2, weight_norm=True, squeeze_out=True,
                         use_negative_ray_vector=True)
    params = F.color_init(jax.random.PRNGKey(5), ccfg)
    k = jax.random.split(jax.random.PRNGKey(6), 4)
    pts = jax.random.normal(k[0], (12, 4))
    dirs = jax.random.normal(k[1], (12, 3))
    grads = jax.random.normal(k[2], (12, 4))
    feat = jax.random.normal(k[3], (12, 16))
    F.set_fused_color("on")
    try:
        c_fused = F.color_apply(ccfg, params, pts, grads, dirs, feat)
    finally:
        F.set_fused_color("off")
    c_plain = F.color_apply(ccfg, params, pts, grads, dirs, feat)
    np.testing.assert_allclose(c_fused, c_plain, rtol=0, atol=5e-6)


def test_routing_matches_plain(setup):
    """sdf_output_and_gradient with fused mode forced on (interpret) equals
    the plain path."""
    from copenerf_tpu.models import fields as F
    params, x = setup
    _ops(jnp.float32)
    F.set_fused_sdf("on")
    try:
        o1, g1 = F.sdf_output_and_gradient(CFG, params, x)
    finally:
        F.set_fused_sdf("auto")
    o2, g2 = F.sdf_output_and_gradient(CFG, params, x)
    np.testing.assert_allclose(o1, o2, rtol=0, atol=5e-6)
    np.testing.assert_allclose(g1, g2, rtol=0, atol=5e-6)
    K._COMPUTE_DTYPE = jnp.float32


def test_fused_rendercore_parity(setup):
    """Combined SDF+gradient+color kernel (interpret) vs the composed XLA
    oracle: forward triple, parameter grads for BOTH nets, x/dirs grads,
    with the reference's severed-gradient and second-order semantics."""
    from copenerf_tpu.models import fields as F
    from copenerf_tpu.ops.pallas.rendercore_kernels import \
        get_fused_rendercore

    params, x = setup
    _ops(jnp.float32)  # reset compute dtype + caches
    ccfg = F.ColorConfig(d_feature=CFG.d_out - 1, d_in=11, d_hidden=48,
                         n_layers=3, multires_view=4, weight_norm=True,
                         squeeze_out=True)
    cparams = F.color_init(jax.random.PRNGKey(7), ccfg)
    dirs = jax.random.normal(jax.random.PRNGKey(8), (40, 3))

    fn = get_fused_rendercore(CFG, ccfg, tile_fwd=8, tile_bwd=8,
                              interpret=True)

    def oracle(ps, pc, xx, dd):
        out = sdf_apply(CFG, ps, xx)
        _, g = sdf_with_gradient(CFG, ps, jax.lax.stop_gradient(xx))
        c = F.color_apply(ccfg, pc, xx, g, dd, out[..., 1:])
        return out[..., :1], g, c

    s_k, g_k, c_k = fn(params, cparams, x, dirs)
    s_r, g_r, c_r = oracle(params, cparams, x, dirs)
    np.testing.assert_allclose(s_k, s_r, rtol=0, atol=5e-6)
    np.testing.assert_allclose(g_k, g_r, rtol=0, atol=5e-6)
    np.testing.assert_allclose(c_k, c_r, rtol=0, atol=5e-6)

    # Loss shaped like the render-core consumers: alpha-ish from sdf,
    # eikonal + sdf-flow from grad, rgb from color.
    def loss(triple):
        s, g, c = triple
        return (jnp.mean(jnp.abs(s))
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1.0) ** 2)
                + 0.2 * jnp.mean(g[..., 3] ** 2)
                + jnp.sum(jnp.sin(3.0 * c)))

    gk = jax.grad(lambda ps, pc, xx, dd: loss(fn(ps, pc, xx, dd)),
                  argnums=(0, 1, 2, 3))(params, cparams, x, dirs)
    gr = jax.grad(lambda ps, pc, xx, dd: loss(oracle(ps, pc, xx, dd)),
                  argnums=(0, 1, 2, 3))(params, cparams, x, dirs)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=5e-5)


def test_fused_rendercore_cons_parity(setup):
    """Render-core kernel with the FOLDED sdf-consistency re-query
    (interpret) vs the composed oracle: the fourth output sdf_w, its
    parameter gradients (accumulated into the same weight blocks) and its
    y cotangent (pose-chain path) all match exactly."""
    from copenerf_tpu.models import fields as F
    from copenerf_tpu.ops.pallas.rendercore_kernels import \
        get_fused_rendercore_cons

    params, x = setup
    _ops(jnp.float32)
    ccfg = F.ColorConfig(d_feature=CFG.d_out - 1, d_in=11, d_hidden=48,
                         n_layers=3, multires_view=4, weight_norm=True,
                         squeeze_out=True)
    cparams = F.color_init(jax.random.PRNGKey(7), ccfg)
    dirs = jax.random.normal(jax.random.PRNGKey(8), (40, 3))
    y = jax.random.normal(jax.random.PRNGKey(11), (40, 4)) * 0.7

    fn = get_fused_rendercore_cons(CFG, ccfg, tile_fwd=8, tile_bwd=8,
                                   interpret=True)

    def oracle(ps, pc, xx, dd, yy):
        out = sdf_apply(CFG, ps, xx)
        _, g = sdf_with_gradient(CFG, ps, jax.lax.stop_gradient(xx))
        c = F.color_apply(ccfg, pc, xx, g, dd, out[..., 1:])
        sdf_w = sdf_apply(CFG, ps, yy)[..., 0]
        return out[..., :1], g, c, sdf_w

    outs_k = fn(params, cparams, x, dirs, y)
    outs_r = oracle(params, cparams, x, dirs, y)
    for a, b in zip(outs_k, outs_r):
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-6)

    # Loss exercising every output incl. the consistency term
    # |sdf_w - sdf| (its sdf side flows through the main value channel,
    # its sdf_w side through the folded value-only backward).
    def loss(quad):
        s, g, c, sw = quad
        return (jnp.mean(jnp.abs(s))
                + jnp.mean((jnp.linalg.norm(g[..., :3], axis=-1) - 1.0) ** 2)
                + 0.2 * jnp.mean(g[..., 3] ** 2)
                + jnp.sum(jnp.sin(3.0 * c))
                + 0.7 * jnp.mean(jnp.abs(sw - s[..., 0])))

    gk = jax.grad(lambda *a: loss(fn(*a)), argnums=(0, 1, 2, 3, 4))(
        params, cparams, x, dirs, y)
    gr = jax.grad(lambda *a: loss(oracle(*a)), argnums=(0, 1, 2, 3, 4))(
        params, cparams, x, dirs, y)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=5e-5)


def test_sdf_grad_color_cons_routing(setup):
    """models.fields.sdf_grad_color_cons fused-on (interpret) == the
    composed fallback (sdf_grad_color + sdf_scalar)."""
    from copenerf_tpu.models import fields as F

    params, x = setup
    _ops(jnp.float32)
    ccfg = F.ColorConfig(d_feature=CFG.d_out - 1, d_in=11, d_hidden=32,
                         n_layers=2, multires_view=2, weight_norm=True,
                         squeeze_out=True)
    cparams = F.color_init(jax.random.PRNGKey(9), ccfg)
    dirs = jax.random.normal(jax.random.PRNGKey(10), (40, 3))
    y = jax.random.normal(jax.random.PRNGKey(12), (40, 4))

    F.set_fused_sdf("on")
    try:
        fused = F.sdf_grad_color_cons(CFG, ccfg, params, cparams, x, dirs,
                                      y)
    finally:
        F.set_fused_sdf("off")
    try:
        plain = F.sdf_grad_color_cons(CFG, ccfg, params, cparams, x, dirs,
                                      y)
    finally:
        F.set_fused_sdf("auto")
    for a, b in zip(fused, plain):
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-6)


def test_sdf_grad_color_routing(setup):
    """models.fields.sdf_grad_color fused-on (interpret) == composed path;
    non-idr / negative-ray configs fall back to composition."""
    from copenerf_tpu.models import fields as F

    params, x = setup
    _ops(jnp.float32)
    ccfg = F.ColorConfig(d_feature=CFG.d_out - 1, d_in=11, d_hidden=32,
                         n_layers=2, multires_view=2, weight_norm=True,
                         squeeze_out=True)
    cparams = F.color_init(jax.random.PRNGKey(9), ccfg)
    dirs = jax.random.normal(jax.random.PRNGKey(10), (40, 3))

    F.set_fused_sdf("on")
    try:
        fused = F.sdf_grad_color(CFG, ccfg, params, cparams, x, dirs)
    finally:
        F.set_fused_sdf("auto")
    plain = F.sdf_grad_color(CFG, ccfg, params, cparams, x, dirs)
    for a, b in zip(fused, plain):
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-6)

    # negative-ray config must route to the composed path even when fused.
    ccfg_neg = F.ColorConfig(d_feature=CFG.d_out - 1, d_in=11, d_hidden=32,
                             n_layers=2, multires_view=2, weight_norm=True,
                             squeeze_out=True, use_negative_ray_vector=True)
    cparams_neg = F.color_init(jax.random.PRNGKey(11), ccfg_neg)
    F.set_fused_sdf("on")
    try:
        neg = F.sdf_grad_color(CFG, ccfg_neg, params, cparams_neg, x, dirs)
    finally:
        F.set_fused_sdf("auto")
    ref = F.sdf_grad_color(CFG, ccfg_neg, params, cparams_neg, x, dirs)
    for a, b in zip(neg, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    K._COMPUTE_DTYPE = jnp.float32
