#!/usr/bin/env python
"""Measure the PyTorch reference's training throughput — and ours — on CPU.

The reference (`/root/reference`, PyTorch, CUDA-only in spirit) cannot be
run on its target GPU in this environment, so BASELINE.md's GPU number is
necessarily an estimate. What CAN be measured honestly is a like-for-like
comparison on identical hardware: this script drives the *actual* reference
training loop (real renderer, real losses, real double-backward, real Adam
steps — `/root/reference/train.py:407-532`) on CPU at the protocol iteration
size (1024 rays as 64 4x4 patches, 64+64 samples), times N iterations, then
times `copenerf_tpu`'s jitted train step on the same CPU at the same
protocol size.

Usage:  python benchmarks/measure_baseline_cpu.py [--iters 3] [--ours-iters 5]

Prints one JSON line:
  {"reference_cpu_rays_per_sec": ..., "ours_cpu_rays_per_sec": ...,
   "cpu_speedup": ...}
and the per-iteration timings. Results are recorded in BASELINE.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

N_FRAMES = 12
RES_H, RES_W = 540, 960
N_POINTS = 1024


class _Stop(Exception):
    pass


def measure_reference(iters: int, warmup: int = 1):
    import conftest

    ref_train = conftest.setup_reference_trainer_env()
    import torch
    import yaml

    import dataloading as dl
    from copenerf_tpu.data.synthetic import make_scene

    root = tempfile.mkdtemp(prefix="baseline_cpu")
    base, scene = make_scene(root, n_frames=N_FRAMES, h=RES_H, w=RES_W,
                             write_depth=False)
    scene_yaml = os.path.join(root, "scene.yaml")
    with open(scene_yaml, "w") as f:
        yaml.safe_dump({
            "dataloading": {"path": base, "scene": [scene],
                            "resize_factor": None, "n_workers": 0,
                            "shuffle": False, "load_gt_depth": False,
                            "sample_rate": 8, "crop_size": 0},
            "training": {"out_dir": os.path.join(root, "out"),
                         "resolution": [RES_H, RES_W],
                         "original_resolution": [RES_H, RES_W],
                         "vis_resolution": [12, 16],
                         "n_training_points": N_POINTS,
                         "pretrained_sdf_path":
                             "/root/reference/pretrained_sdf/model.pt",
                         "coarse_to_fine_scheduler": {}},
        }, f)

    cfg = dl.load_config(scene_yaml, "/root/reference/configs/default.yaml")
    torch.manual_seed(0)
    trainer = ref_train.Trainer(cfg)
    trainer.device = "cpu"
    trainer.model.device = "cpu"
    ref_train.cfg = cfg
    trainer.visualize_log = lambda *a, **k: None

    times = []
    orig_backprop = trainer.model.backpropagation
    state = {"t0": None, "count": 0}

    def timed_backprop(loss_dict, train_motion_network):
        orig_backprop(loss_dict, train_motion_network)  # real backward+Adam
        now = time.perf_counter()
        if state["t0"] is not None:
            state["count"] += 1
            dt = now - state["t1"]
            print(f"[ref iter {state['count']}] {dt:.1f}s",
                  file=sys.stderr, flush=True)
            if state["count"] > warmup:
                times.append(dt)
        else:
            state["t0"] = now
        state["t1"] = now
        if len(times) >= iters:
            raise _Stop

    trainer.model.backpropagation = timed_backprop
    try:
        trainer.train()
    except _Stop:
        pass
    per_iter = sum(times) / len(times)
    return per_iter, times


def measure_ours(iters: int, warmup: int = 2):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

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
    static = StepStatic(
        h=RES_H, w=RES_W, patch_size=4, n_points=N_POINTS, stage1=True,
        n_images=N_FRAMES, nb_sample_timestep=10, n_ref=3, train_motion=True,
        sdf_cons_pose_grad=False, use_flow_rgb=True, use_sdf_consistency=True)
    step = build_train_step(field_cfgs, rcfg, static)
    state = init_train_state(params)

    rng = np.random.RandomState(0)
    fx = fy = 600.0
    cam = np.array([[2 * fx / RES_W, 0, 0, 0], [0, -2 * fy / RES_H, 0, 0],
                    [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
    batch = {
        "images_all": jnp.asarray(
            rng.rand(N_FRAMES, 3, RES_H, RES_W).astype(np.float32)),
        "K_all": jnp.asarray(np.stack([cam] * N_FRAMES)),
        "ref_idxs": jnp.asarray([3, 4, 5], jnp.int32),
        "ref_in_list": jnp.ones(3, jnp.float32),
        "ref_valid_flow": jnp.ones(3, jnp.float32),
        "scale_mat": jnp.eye(4), "world_mat": jnp.eye(4),
        "query_time_step": jnp.asarray(-0.5, jnp.float32),
        "world_time_step": jnp.asarray(0.0, jnp.float32),
        "image_idx": jnp.asarray(2, jnp.int32),
        "world_cam_idx": jnp.asarray(6, jnp.int32),
        "near": jnp.asarray(0.01, jnp.float32),
        "far": jnp.asarray(10.0, jnp.float32),
        "cos_anneal_ratio": jnp.asarray(0.0, jnp.float32),
        "loss_weights": make_loss_weights(1.0, 0.1, 0.1, 7.5, 0.0, 1.0,
                                          1e-4),
        "lr": jnp.asarray(1e-3, jnp.float32),
        "motion_lr": jnp.asarray(5e-4, jnp.float32),
    }
    t_c = time.perf_counter()
    for i in range(warmup):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])
    print(f"[ours warmup+compile] {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        float(metrics["loss"])
        print(f"[ours iter {i}] {time.perf_counter() - t0:.1f}s cumulative",
              file=sys.stderr, flush=True)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--ours-iters", type=int, default=5)
    ap.add_argument("--mode", choices=("both", "ref", "ours"),
                    default="both")
    args = ap.parse_args()

    out = {}
    if args.mode in ("both", "ours"):
        ours_per_iter = measure_ours(args.ours_iters)
        out.update({
            "ours_cpu_sec_per_iter": round(ours_per_iter, 3),
            "ours_cpu_rays_per_sec": round(N_POINTS / ours_per_iter, 1),
        })
    if args.mode in ("both", "ref"):
        ref_per_iter, ref_times = measure_reference(args.iters)
        out.update({
            "reference_cpu_sec_per_iter": round(ref_per_iter, 3),
            "reference_cpu_rays_per_sec": round(N_POINTS / ref_per_iter, 1),
            "reference_cpu_iter_times": [round(t, 3) for t in ref_times],
        })
    if args.mode == "both":
        out["cpu_speedup"] = round(ref_per_iter / ours_per_iter, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
