"""Smoke + behavior tests of the jitted train step on a tiny synthetic setup."""

import numpy as np
import pytest

import conftest  # noqa: F401  (sets cpu platform)

import jax
import jax.numpy as jnp

from copenerf_tpu.models import (ColorConfig, MotionConfig, NerfConfig,
                                 SDFConfig, VarianceConfig, init_all_fields)
from copenerf_tpu.ops.renderer import RendererConfig
from copenerf_tpu.training.step import (StepStatic, build_train_step,
                                        init_train_state, make_loss_weights,
                                        sample_patch_indices)

H = W = 24
FIELD_CFGS = {
    # d_hidden must exceed the 52-dim positional embedding for the skip layer.
    "sdf": SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), d_out=33),
    "color": ColorConfig(d_feature=32, d_hidden=32, n_layers=2),
    "motion": MotionConfig(d_hidden=32, n_layers=2, skip_in=(1,)),
    "variance": VarianceConfig(init_val=0.3),
    "nerf": NerfConfig(D=2, W=32),
}
RCFG = RendererConfig(n_samples=16, n_importance=16, up_sample_steps=2)


def _camera_mat():
    fx = fy = 30.0
    return np.array([[2 * fx / W, 0, 0, 0], [0, -2 * fy / H, 0, 0],
                     [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)


def _batch(key, stage1=True):
    rng = np.random.RandomState(0)
    return {
        "images_all": jnp.asarray(rng.rand(7, 3, H, W).astype(np.float32)),
        "K_all": jnp.asarray(np.stack([_camera_mat()] * 7)),
        "ref_idxs": jnp.asarray([3, 4, 5], jnp.int32),
        "ref_in_list": jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
        "ref_valid_flow": jnp.asarray([1.0, 1.0, 0.0], jnp.float32),
        "scale_mat": jnp.eye(4),
        "world_mat": jnp.eye(4),
        "query_time_step": jnp.asarray(-0.2),
        "world_time_step": jnp.asarray(0.0),
        "image_idx": jnp.asarray(2, jnp.int32),
        "world_cam_idx": jnp.asarray(3, jnp.int32),
        "near": jnp.asarray(0.5),
        "far": jnp.asarray(3.5),
        "cos_anneal_ratio": jnp.asarray(0.5),
        "loss_weights": make_loss_weights(1.0, 0.1, 0.1, 7.5, 0.1, 1.0,
                                          1e-4),
        "lr": jnp.asarray(1e-3),
        "motion_lr": jnp.asarray(5e-4),
    }


def _static(stage1=True, train_motion=True):
    return StepStatic(h=H, w=W, patch_size=4, n_points=64, stage1=stage1,
                      n_images=7, nb_sample_timestep=4, n_ref=3,
                      train_motion=train_motion, sdf_cons_pose_grad=False,
                      use_flow_rgb=stage1, use_sdf_consistency=stage1)


def test_sample_patch_indices_shape_and_validity():
    idx = np.asarray(sample_patch_indices(jax.random.PRNGKey(0), H, W, 4, 64))
    assert idx.shape == (64,)
    assert idx.min() >= 0 and idx.max() < H * W
    # Each patch spans 4 consecutive cols over 4 consecutive rows.
    patch = idx.reshape(4, 16)[0]
    rows, cols = patch // W, patch % W
    assert rows.max() - rows.min() == 3
    assert cols.max() - cols.min() == 3


def test_stage1_step_runs_and_descends():
    params = init_all_fields(jax.random.PRNGKey(0), FIELD_CFGS)
    state = init_train_state(params)
    step = build_train_step(FIELD_CFGS, RCFG, _static(stage1=True))
    batch = _batch(jax.random.PRNGKey(1))
    losses = []
    for i in range(15):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses)), losses
    # Loss should descend on a fixed batch.
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    for k in ("loss_rgb", "loss_sdf", "loss_flow_rgb",
              "sdf_consistency_loss", "edge_aware_smoothness_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_stage2_step_runs():
    params = init_all_fields(jax.random.PRNGKey(0), FIELD_CFGS)
    state = init_train_state(params)
    step = build_train_step(FIELD_CFGS, RCFG,
                            _static(stage1=False, train_motion=False))
    batch = _batch(jax.random.PRNGKey(1), stage1=False)
    motion_before = jax.tree_util.tree_leaves(state["params"]["motion"])[0]
    motion_before = np.asarray(motion_before).copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_sdf"]) == 0.0
    assert float(metrics["loss_flow_rgb"]) == 0.0
    # Motion net must stay frozen in stage 2.
    motion_after = np.asarray(
        jax.tree_util.tree_leaves(state["params"]["motion"])[0])
    np.testing.assert_array_equal(motion_before, motion_after)


def test_nerf_params_never_updated():
    params = init_all_fields(jax.random.PRNGKey(0), FIELD_CFGS)
    state = init_train_state(params)
    step = build_train_step(FIELD_CFGS, RCFG, _static())
    nerf_before = np.asarray(
        jax.tree_util.tree_leaves(state["params"]["nerf"])[0]).copy()
    state, _ = step(state, _batch(jax.random.PRNGKey(1)),
                    jax.random.PRNGKey(0))
    nerf_after = np.asarray(
        jax.tree_util.tree_leaves(state["params"]["nerf"])[0])
    np.testing.assert_array_equal(nerf_before, nerf_after)


def test_scaled_batch_keeps_per_ray_semantics():
    """rays_per_step scaling: every loss term is a per-ray (or per-sample)
    mean, so a 4x batch over rays R1..R4 must reproduce the average of the
    four 1024-protocol losses — exactly for the linear means (rgb, l2,
    eikonal, smoothness), and to first order for the ratio-normalized terms
    (sdf-flow, flow-rgb) whose denominators concentrate as the batch grows.
    Gradients of the scaled batch must align with the averaged small-batch
    gradients."""
    from copenerf_tpu.training.step import compute_losses

    params = init_all_fields(jax.random.PRNGKey(0), FIELD_CFGS)
    batch = _batch(jax.random.PRNGKey(1))
    small = _static(stage1=True)                       # n_points=64
    big = StepStatic(**{**small.__dict__, "n_points": 256})

    # Four disjoint 64-ray patch sets and their union.
    keys = [jax.random.PRNGKey(100 + i) for i in range(4)]
    idx_sets = [sample_patch_indices(k, H, W, 4, 64) for k in keys]
    idx_union = jnp.concatenate(idx_sets)
    t_rand_sets = [jax.random.uniform(jax.random.fold_in(k, 7), (64, 16))
                   for k in keys]
    t_rand_union = jnp.concatenate(t_rand_sets)

    def value_and_grad(static, ray_idx, t_rand):
        def f(p):
            total, metrics = compute_losses(FIELD_CFGS, RCFG, static, p,
                                            batch, ray_idx, t_rand=t_rand)
            return total, metrics
        return jax.value_and_grad(f, has_aux=True)(params)

    small_runs = [value_and_grad(small, i, t)
                  for i, t in zip(idx_sets, t_rand_sets)]
    (big_total, big_metrics), big_grads = value_and_grad(
        big, idx_union, t_rand_union)

    # Linear per-ray means: exact agreement with the 4-run average.
    for term in ("loss_rgb", "l2_mean", "loss_eikonal", "smoothness_loss",
                 "edge_aware_smoothness_loss"):
        avg = np.mean([float(m[term]) for (_, m), _ in small_runs])
        np.testing.assert_allclose(float(big_metrics[term]), avg, rtol=1e-5,
                                   err_msg=term)
    # Ratio-normalized terms: same scale (they agree in expectation).
    for term in ("loss_sdf", "loss_flow_rgb"):
        avg = np.mean([float(m[term]) for (_, m), _ in small_runs])
        np.testing.assert_allclose(float(big_metrics[term]), avg, rtol=0.35,
                                   err_msg=term)

    # Gradient direction: big-batch grad ~ average of small-batch grads.
    avg_grads = jax.tree_util.tree_map(
        lambda *gs: sum(np.asarray(g) for g in gs) / len(gs),
        *[g for _, g in small_runs])
    flat_big = np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree_util.tree_leaves(big_grads)])
    flat_avg = np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree_util.tree_leaves(avg_grads)])
    cos = np.dot(flat_big, flat_avg) / (
        np.linalg.norm(flat_big) * np.linalg.norm(flat_avg) + 1e-12)
    assert cos > 0.98, cos


# ----------------------------------------------------------------------
# Round-5 micro-optimizations: exactness guards. Neither path is reached
# by the tiny-image suites above (the two-stage top-k only activates for
# populations > 2048; flat-buffer Adam is exercised end-to-end but its
# equivalence to per-leaf Adam deserves a direct witness).

def test_two_stage_topk_matches_global_topk():
    """_flat_topk_indices == lax.top_k as a SET, incl. the padded tail and
    the protocol-scale population (540x960 patch corners -> 513,909)."""
    from copenerf_tpu.training.step import _flat_topk_indices

    key = jax.random.PRNGKey(7)
    cases = [
        (513_909, 64),   # real 540x960 / ps=4 protocol population (pad path)
        (4096, 64),      # exact multiple of the 1024-column block
        (4097, 64),      # one-element last row
        (3000, 7),       # small k, padded
        (2049, 1),       # just past the fallback threshold
        (2048, 64),      # fallback: n <= 2*cols
        (1500, 64),      # fallback: small population
        (5000, 1500),    # fallback: k > cols
    ]
    for n, k in cases:
        z = jax.random.uniform(jax.random.fold_in(key, n * 131 + k), (n,))
        got = np.asarray(_flat_topk_indices(z, k))
        want = np.asarray(jax.lax.top_k(z, k)[1])
        assert got.shape == want.shape == (k,), (n, k)
        assert set(got.tolist()) == set(want.tolist()), (n, k)


def test_patch_sampling_protocol_scale_valid():
    """sample_patch_indices at the REAL image scale (exercises the
    two-stage top-k branch): every flat index in range, patches
    non-overlapping corners, exact count."""
    h, w, ps, n_points = 540, 960, 4, 1024
    idx = np.asarray(sample_patch_indices(jax.random.PRNGKey(3), h, w, ps,
                                          n_points))
    assert idx.shape == (n_points,)
    assert idx.min() >= 0 and idx.max() < h * w
    corners = idx.reshape(-1, ps * ps)[:, 0]
    assert len(set(corners.tolist())) == n_points // (ps * ps)
    # Each patch is a contiguous ps x ps block below/right of its corner.
    rows, cols = idx // w, idx % w
    r0 = np.repeat(corners // w, ps * ps)
    c0 = np.repeat(corners % w, ps * ps)
    assert ((rows - r0) >= 0).all() and ((rows - r0) < ps).all()
    assert ((cols - c0) >= 0).all() and ((cols - c0) < ps).all()


def test_flat_adam_matches_per_leaf_adam():
    """Adam is elementwise, so one fused update over a raveled buffer must
    equal the per-leaf pytree update — for several steps (bias-correction
    count included)."""
    from jax.flatten_util import ravel_pytree

    from copenerf_tpu.training.step import make_optimizers

    tx = make_optimizers()
    rng = np.random.RandomState(11)
    params = {
        "a": jnp.asarray(rng.randn(3, 5).astype(np.float32)),
        "b": {"w": jnp.asarray(rng.randn(8).astype(np.float32)),
              "g": jnp.asarray(rng.randn(1).astype(np.float32))},
    }
    st_tree = tx.init(params)
    pflat, unravel = ravel_pytree(params)
    st_flat = tx.init(pflat)
    params_tree, params_flat = params, pflat
    for step in range(4):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.cos(p * (step + 1)) * 0.1, params_tree)
        u_tree, st_tree = tx.update(grads, st_tree, params_tree)
        params_tree = jax.tree_util.tree_map(lambda p, u: p - 1e-2 * u,
                                             params_tree, u_tree)
        gflat, _ = ravel_pytree(grads)
        u_flat, st_flat = tx.update(gflat, st_flat, params_flat)
        params_flat = params_flat - 1e-2 * u_flat
    for a, b in zip(jax.tree_util.tree_leaves(params_tree),
                    jax.tree_util.tree_leaves(unravel(params_flat))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
