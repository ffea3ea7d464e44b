#!/usr/bin/env python
"""Benchmark: full stage-1 train-step throughput on the available device.

Measures the reference training protocol's iteration (1024 rays as 64 4x4
patches, 64 uniform + 64 importance samples, all stage-1 losses, double
Adam update, full-size field networks) and reports rays/s.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N}

Baseline: the reference repo publishes no numbers and its PyTorch code is
CUDA-only (unmeasurable here); BASELINE_RAYS_PER_SEC is an estimate of the
reference on a single modern GPU (~3 it/s at 1024 rays for an eager-mode
NeuS renderer with autograd-in-forward and double backward). See BASELINE.md.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 3000.0

N_POINTS = 1024
H, W = 540, 960
N_IMAGES = 100
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from copenerf_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from copenerf_tpu.config.loader import load_config
    from copenerf_tpu.models import configs_from_cfg, init_all_fields
    from copenerf_tpu.ops.renderer import RendererConfig
    from copenerf_tpu.training.step import (StepStatic, build_train_step,
                                            init_train_state,
                                            make_loss_weights)

    cfg = load_config(None)
    field_cfgs = configs_from_cfg(cfg)
    rcfg = RendererConfig.from_cfg(cfg)
    params = init_all_fields(jax.random.PRNGKey(0), field_cfgs)

    mesh = None
    if len(jax.devices()) > 1:
        from copenerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    static = StepStatic(
        h=H, w=W, patch_size=4, n_points=N_POINTS, stage1=True,
        n_images=N_IMAGES, nb_sample_timestep=10, n_ref=3, train_motion=True,
        sdf_cons_pose_grad=False, use_flow_rgb=True, use_sdf_consistency=True)
    step = build_train_step(field_cfgs, rcfg, static, mesh=mesh)
    state = init_train_state(params)

    rng = np.random.RandomState(0)
    fx = fy = 600.0
    cam = np.array([[2 * fx / W, 0, 0, 0], [0, -2 * fy / H, 0, 0],
                    [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
    batch = {
        "images_all": jnp.asarray(
            rng.rand(N_IMAGES, 3, H, W).astype(np.float32)),
        "K_all": jnp.asarray(np.stack([cam] * N_IMAGES)),
        "ref_idxs": jnp.asarray([51, 52, 53], jnp.int32),
        "ref_in_list": jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
        "ref_valid_flow": jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
        "scale_mat": jnp.eye(4),
        "world_mat": jnp.eye(4),
        "query_time_step": jnp.asarray(0.0, jnp.float32),
        "world_time_step": jnp.asarray(0.0, jnp.float32),
        "image_idx": jnp.asarray(50, jnp.int32),
        "world_cam_idx": jnp.asarray(49, jnp.int32),
        "near": jnp.asarray(0.01, jnp.float32),
        "far": jnp.asarray(5.0, jnp.float32),
        "cos_anneal_ratio": jnp.asarray(0.5, jnp.float32),
        "loss_weights": make_loss_weights(0.33333, 0.1, 0.1, 7.5, 0.0, 1.0,
                                          1e-4),
        "lr": jnp.asarray(1e-3, jnp.float32),
        "motion_lr": jnp.asarray(5e-4, jnp.float32),
    }

    # NOTE: jax.block_until_ready is NOT a reliable fence on tunneled
    # backends (the 'axon' TPU transport resolves buffer futures before the
    # device drains) — a host fetch of the value is the only honest sync.
    from copenerf_tpu.utils.profiling import sync

    for i in range(WARMUP):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    sync(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, batch, jax.random.PRNGKey(WARMUP + i))
    sync(metrics["loss"])  # steps chain through `state`: one fetch drains all
    dt = time.perf_counter() - t0

    iters_per_sec = ITERS / dt
    rays_per_sec = iters_per_sec * N_POINTS
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
