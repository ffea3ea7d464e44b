"""Multi-device ray sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

import test_train_step as T

from copenerf_tpu.models import init_all_fields
from copenerf_tpu.parallel.mesh import make_mesh
from copenerf_tpu.training.step import build_train_step, init_train_state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    mesh = make_mesh(8)
    params = init_all_fields(jax.random.PRNGKey(0), T.FIELD_CFGS)
    static = T._static(stage1=True)
    batch = T._batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(5)

    step_single = build_train_step(T.FIELD_CFGS, T.RCFG, static, mesh=None)
    step_sharded = build_train_step(T.FIELD_CFGS, T.RCFG, static, mesh=mesh)

    # The step donates its state; give each run an independent copy.
    state_a = jax.tree_util.tree_map(jnp.array, init_train_state(params))
    state_b = jax.tree_util.tree_map(jnp.array, init_train_state(params))
    s1, m1 = step_single(state_a, batch, key)
    s8, m8 = step_sharded(state_b, batch, key)

    assert np.isfinite(float(m8["loss"]))
    # Same math, different reduction order.
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-3)
    a = np.asarray(s1["params"]["sdf"]["lin0"]["v"])
    b = np.asarray(s8["params"]["sdf"]["lin0"]["v"])
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_runs_multiple_iterations():
    mesh = make_mesh(8)
    params = init_all_fields(jax.random.PRNGKey(0), T.FIELD_CFGS)
    state = init_train_state(params)
    step = build_train_step(T.FIELD_CFGS, T.RCFG, T._static(stage1=True),
                            mesh=mesh)
    batch = T._batch(jax.random.PRNGKey(1))
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_helpers_single_process():
    """Multi-host helpers degrade to plain sharded/replicated arrays under a
    single process; a sharded step consumes their outputs unchanged."""
    from copenerf_tpu.parallel import distributed as dist

    dist.initialize()  # no-op single-process
    assert dist.is_primary()
    mesh = dist.global_mesh(8)

    batch = T._batch(jax.random.PRNGKey(1))
    gbatch = dist.replicate_to_global(mesh, batch)
    np.testing.assert_allclose(np.asarray(gbatch["world_mat"]),
                               np.asarray(batch["world_mat"]))

    rays = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    grays = dist.shard_to_global(mesh, rays)
    assert grays.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(grays), rays)

    params = init_all_fields(jax.random.PRNGKey(0), T.FIELD_CFGS)
    state = init_train_state(params)
    step = build_train_step(T.FIELD_CFGS, T.RCFG, T._static(stage1=True),
                            mesh=mesh)
    state, metrics = step(state, gbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fullsize_sharded_step_matches_single_device():
    """FULL-SIZE fields (256-wide 9-layer SDF, 64+64 samples) on the
    8-device mesh == single device — the production program, not the
    width-reduced test configs (only the ray count is small)."""
    from copenerf_tpu.models import (ColorConfig, MotionConfig, NerfConfig,
                                     SDFConfig, VarianceConfig)
    from copenerf_tpu.ops.renderer import RendererConfig

    full_cfgs = {"sdf": SDFConfig(), "color": ColorConfig(),
                 "motion": MotionConfig(),
                 "variance": VarianceConfig(init_val=0.3),
                 "nerf": NerfConfig()}
    rcfg = RendererConfig()          # 64 + 64, 4 up-sample rounds
    static = T.StepStatic(
        h=T.H, w=T.W, patch_size=4, n_points=16, stage1=True, n_images=7,
        nb_sample_timestep=4, n_ref=3, train_motion=True,
        sdf_cons_pose_grad=False, use_flow_rgb=True,
        use_sdf_consistency=True)
    mesh = make_mesh(8)
    params = init_all_fields(jax.random.PRNGKey(0), full_cfgs)
    batch = T._batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(5)

    step_single = build_train_step(full_cfgs, rcfg, static, mesh=None)
    step_sharded = build_train_step(full_cfgs, rcfg, static, mesh=mesh)

    state_a = jax.tree_util.tree_map(jnp.array, init_train_state(params))
    state_b = jax.tree_util.tree_map(jnp.array, init_train_state(params))
    s1, m1 = step_single(state_a, batch, key)
    s8, m8 = step_sharded(state_b, batch, key)

    assert np.isfinite(float(m8["loss"]))
    # Same math, different reduction order; deeper nets accumulate more
    # rounding than the 64-wide configs, hence the looser tolerance.
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=5e-3)
    a = np.asarray(s1["params"]["sdf"]["lin0"]["v"])
    b = np.asarray(s8["params"]["sdf"]["lin0"]["v"])
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_image_renderer_matches_single_device():
    """Full-image eval rendering sharded over the mesh == unsharded."""
    from copenerf_tpu.evaluation.render import ImageRenderer

    mesh = make_mesh(8)
    params = init_all_fields(jax.random.PRNGKey(0), T.FIELD_CFGS)
    h, w = 24, 32
    fx = fy = 30.0
    cam = np.array([[2 * fx / w, 0, 0, 0], [0, -2 * fy / h, 0, 0],
                    [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
    eye = np.eye(4, dtype=np.float32)
    args = (params, cam, eye, eye, 0.0, (h, w), (0.5, 3.5), 1.0)

    r1 = ImageRenderer(T.FIELD_CFGS, T.RCFG, chunk=512, mesh=None)
    r8 = ImageRenderer(T.FIELD_CFGS, T.RCFG, chunk=512, mesh=mesh)
    # Small chunks are honored (512 < the old 1024 floor), so the 768-pixel
    # image genuinely exercises the multi-chunk accumulation/concat path.
    assert r1.chunk == 512 and r8.chunk == 512
    out1 = r1.render_image(*args)
    out8 = r8.render_image(*args)
    for k in ("color", "depth", "normal", "weighted_z", "depth_highest"):
        np.testing.assert_allclose(out8[k], out1[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
