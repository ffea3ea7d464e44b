"""Golden-value parity of the JAX field networks against the PyTorch reference.

The reference at /root/reference is imported (read-only) purely as an oracle:
torch networks are constructed on CPU, their state dicts ingested into our
pytrees, and outputs compared.
"""

import numpy as np
import pytest

import conftest

pytestmark = pytest.mark.skipif(not conftest.has_reference(),
                                reason="reference repo not available")

conftest.add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from copenerf_tpu.models import (  # noqa: E402
    ColorConfig, MotionConfig, NerfConfig, SDFConfig, color_apply,
    motion_apply, nerf_apply, positional_encoding, sdf_apply, sdf_init,
    sdf_with_gradient, variance_inv_s)
from copenerf_tpu.models.torch_io import (  # noqa: E402
    color_params_from_torch, load_pretrained_sdf, motion_params_from_torch,
    nerf_params_from_torch, sdf_params_from_torch)

torch.manual_seed(0)


def _torch_sd(module):
    return {k: v for k, v in module.state_dict().items()}


def test_positional_encoding_matches_reference():
    from model.neus_embedder import get_embedder

    embed_fn, out_dim = get_embedder(6, input_dims=4)
    x = np.random.RandomState(0).randn(17, 4).astype(np.float32)
    ref = embed_fn(torch.from_numpy(x)).numpy()
    ours = np.asarray(positional_encoding(jnp.asarray(x), 6))
    assert ours.shape[-1] == out_dim
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_sdf_forward_matches_pretrained_checkpoint():
    from model.neus_fields import SDFNetwork

    net = SDFNetwork(d_out=257, d_in=4, d_hidden=256, n_layers=8,
                     skip_in=(4,), multires=6, bias=0.5, scale=1.0,
                     geometric_init=True, weight_norm=True)
    sd = torch.load("/root/reference/pretrained_sdf/model.pt",
                    map_location="cpu")
    net.load_state_dict(sd)
    x = np.random.RandomState(1).randn(64, 4).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()

    params = load_pretrained_sdf("/root/reference/pretrained_sdf/model.pt")
    ours = np.asarray(sdf_apply(SDFConfig(), params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_sdf_gradient_matches_torch_autograd():
    from model.neus_fields import SDFNetwork

    net = SDFNetwork(d_out=257, d_in=4, d_hidden=256, n_layers=8,
                     skip_in=(4,), multires=6, bias=0.5, scale=1.0,
                     geometric_init=True, weight_norm=True)
    sd = torch.load("/root/reference/pretrained_sdf/model.pt",
                    map_location="cpu")
    net.load_state_dict(sd)
    x = np.random.RandomState(2).randn(32, 4).astype(np.float32) * 0.4

    ref_grad = net.gradient(torch.from_numpy(x)).squeeze(1).detach().numpy()

    params = load_pretrained_sdf("/root/reference/pretrained_sdf/model.pt")
    _, grads = sdf_with_gradient(SDFConfig(), params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grads), ref_grad, rtol=2e-3,
                               atol=2e-4)


def test_color_network_parity():
    from model.neus_fields import RenderingNetwork

    net = RenderingNetwork(d_feature=256, mode="idr", d_in=11, d_out=3,
                           d_hidden=256, n_layers=4, weight_norm=True,
                           multires_view=4, squeeze_out=True,
                           use_negative_ray_vector=False)
    rng = np.random.RandomState(3)
    pts = rng.randn(20, 4).astype(np.float32)
    normals = rng.randn(20, 4).astype(np.float32)
    dirs = rng.randn(20, 3).astype(np.float32)
    feat = rng.randn(20, 256).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(pts), torch.from_numpy(normals),
                  torch.from_numpy(dirs), torch.from_numpy(feat)).numpy()
    params = color_params_from_torch(_torch_sd(net))
    ours = np.asarray(color_apply(ColorConfig(), params, jnp.asarray(pts),
                                  jnp.asarray(normals), jnp.asarray(dirs),
                                  jnp.asarray(feat)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_motion_network_parity():
    from model.neus_fields import MotionNetwork

    net = MotionNetwork(d_out=6, d_in=1, d_hidden=256, n_layers=4,
                        skip_in=[2], multires=6, bias=0.5, scale=1.0,
                        geometric_init=False, weight_norm=True)
    t = np.linspace(-1, 1, 13, dtype=np.float32).reshape(-1, 1)
    with torch.no_grad():
        ref_w, ref_v = net(torch.from_numpy(t))
    params = motion_params_from_torch(_torch_sd(net))
    w, v = motion_apply(MotionConfig(), params, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(v), ref_v.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_background_nerf_parity():
    from model.neus_fields import NeRF

    net = NeRF(D=8, W=256, d_in=4, d_in_view=3, multires=10, multires_view=4,
               output_ch=4, skips=[4], use_viewdirs=True)
    rng = np.random.RandomState(5)
    pts = rng.randn(16, 4).astype(np.float32)
    views = rng.randn(16, 3).astype(np.float32)
    with torch.no_grad():
        ref_alpha, ref_rgb = net(torch.from_numpy(pts),
                                 torch.from_numpy(views))
    params = nerf_params_from_torch(_torch_sd(net))
    alpha, rgb = nerf_apply(NerfConfig(), params, jnp.asarray(pts),
                            jnp.asarray(views))
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_variance_network():
    v = {"variance": jnp.asarray(0.3)}
    np.testing.assert_allclose(float(variance_inv_s(v)), np.exp(3.0),
                               rtol=1e-6)


def test_geometric_init_statistics():
    """Geometric init should start near a unit-sphere SDF (IDR property)."""
    cfg = SDFConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    pts = rng.randn(256, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    x = np.concatenate([2.0 * pts, np.zeros((256, 1), np.float32)], -1)
    sdf = np.asarray(sdf_apply(cfg, params, jnp.asarray(x))[:, 0])
    # points at radius 2 of a unit sphere: sdf ~ +1
    assert np.all(sdf > 0.2), sdf.mean()
    x0 = np.concatenate([0.0 * pts, np.zeros((256, 1), np.float32)], -1)
    sdf0 = np.asarray(sdf_apply(cfg, params, jnp.asarray(x0))[:, 0])
    assert np.all(sdf0 < 0.0), sdf0.mean()
