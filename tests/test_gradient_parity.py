"""Parameter-gradient parity of the rendering loss vs the PyTorch reference.

This exercises the hardest AD path: reverse-mode through the forward-mode SDF
spatial gradient (the reference's create_graph=True double backward) feeding
the color network, the eikonal term, and the alpha compositing.
"""

import numpy as np
import pytest

import conftest

pytestmark = pytest.mark.skipif(not conftest.has_reference(),
                                reason="reference repo not available")

conftest.add_reference_to_path()

import torch  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self
torch.manual_seed(0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_renderer_parity import (FIELD_CFGS, _build_reference_renderer,  # noqa: E402
                                  _ingest, _rand_rays)
from copenerf_tpu.ops.renderer import RendererConfig, render  # noqa: E402


def test_parameter_gradients_match():
    renderer = _build_reference_renderer()
    params = _ingest(renderer)
    n = 8
    rays_o, rays_d, norm = _rand_rays(n, 7)
    near = np.full((n, 1), 0.01, np.float32)
    far = np.full((n, 1), 5.0, np.float32)
    time_step = np.asarray([0.1], np.float32)
    target = np.random.RandomState(8).rand(n, 3).astype(np.float32)
    t_rand = np.random.RandomState(9).rand(n, 64).astype(np.float32)

    # --- torch side ---
    torch_rand = torch.rand

    def fake_rand(*shape, **kw):
        if tuple(shape[0] if isinstance(shape[0], (list, tuple))
                 else shape) == (n, 64):
            return torch.from_numpy(t_rand)
        return torch_rand(*shape, **kw)

    torch.rand = fake_rand
    try:
        out = renderer(torch.from_numpy(rays_o), torch.from_numpy(rays_d),
                       torch.from_numpy(norm), torch.from_numpy(time_step),
                       torch.from_numpy(near), torch.from_numpy(far),
                       background_rgb=None, cos_anneal_ratio=0.6, it=100,
                       eval=False)
    finally:
        torch.rand = torch_rand
    rgb_loss = torch.sum(
        torch.abs(out["color_fine"] - torch.from_numpy(target))) / n
    normals = out["normals"].reshape(-1, 3)
    eik = torch.mean((torch.linalg.norm(normals, dim=-1) - 1.0) ** 2)
    loss_t = rgb_loss + 0.1 * eik
    loss_t.backward()
    g_sdf_t = renderer.sdf_network.lin0.weight_v.grad.numpy()
    g_color_t = renderer.color_network.lin0.weight_v.grad.numpy()
    g_var_t = renderer.deviation_network.variance.grad.numpy()

    # --- jax side ---
    def loss_fn(p):
        o = render(FIELD_CFGS, p, jnp.asarray(rays_o), jnp.asarray(rays_d),
                   jnp.asarray(norm), jnp.asarray(time_step[0]),
                   jnp.asarray(near), jnp.asarray(far),
                   rcfg=RendererConfig(), cos_anneal_ratio=0.6,
                   use_importance=True, train=True,
                   t_rand=jnp.asarray(t_rand))
        rgb = jnp.sum(jnp.abs(o["color_fine"] - jnp.asarray(target))) / n
        nrm = o["normals"].reshape(-1, 3)
        eik_j = jnp.mean((jnp.linalg.norm(nrm, axis=-1) - 1.0) ** 2)
        return rgb + 0.1 * eik_j, (rgb, eik_j)

    (loss_j, (rgb_j, eik_j)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-3)
    np.testing.assert_allclose(float(rgb_j), float(rgb_loss), rtol=1e-3)
    np.testing.assert_allclose(float(eik_j), float(eik), rtol=1e-2)

    g_sdf_j = np.asarray(grads["sdf"]["lin0"]["v"]).T  # ours (in,out)
    g_color_j = np.asarray(grads["color"]["lin0"]["v"]).T
    g_var_j = np.asarray(grads["variance"]["variance"])

    def assert_close(a, b, name, rtol=0.02):
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=rtol,
                                   err_msg=name)
        # Direction must agree strongly.
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.999, f"{name} cosine {cos}"

    assert_close(g_sdf_j, g_sdf_t, "sdf lin0 grad")
    assert_close(g_color_j, g_color_t, "color lin0 grad")
    np.testing.assert_allclose(g_var_j, g_var_t, rtol=2e-2)
