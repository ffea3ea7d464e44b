#!/usr/bin/env python
"""Decompose the train-step time by ablating components (device timings).

Times the full stage-1 step, then variants with individual loss blocks /
stages disabled, at the protocol batch. The deltas attribute the ~ms cost
of each block on real hardware (complements the microbenchmarks).

Usage: python benchmarks/ablate_step.py [--rays 1024]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench as B
    from copenerf_tpu.config.loader import load_config
    from copenerf_tpu.models import configs_from_cfg, init_all_fields
    from copenerf_tpu.ops.renderer import RendererConfig
    from copenerf_tpu.training.step import (StepStatic, build_train_step,
                                            init_train_state)
    from copenerf_tpu.utils.compile_cache import enable_compilation_cache
    from copenerf_tpu.utils.profiling import sync

    enable_compilation_cache()
    cfg = load_config(None)
    field_cfgs = configs_from_cfg(cfg)
    rcfg = RendererConfig.from_cfg(cfg)
    params = init_all_fields(jax.random.PRNGKey(0), field_cfgs)
    _, state0, batch = B.build(args.rays)  # reuse bench's batch construction
    del state0

    base = dict(h=B.H, w=B.W, patch_size=4, n_points=args.rays,
                stage1=True, n_images=B.N_IMAGES, nb_sample_timestep=10,
                n_ref=3, train_motion=True, sdf_cons_pose_grad=False,
                use_flow_rgb=True, use_sdf_consistency=True)
    variants = [
        ("full stage-1", {}),
        ("no flow_rgb", {"use_flow_rgb": False}),
        ("no sdf_consistency", {"use_sdf_consistency": False}),
        ("no flow_rgb + no sdf_cons", {"use_flow_rgb": False,
                                       "use_sdf_consistency": False}),
        ("stage-2 (no aux)", {"stage1": False, "train_motion": False}),
        ("no importance (64 uniform)", {"use_importance": False}),
    ]

    for name, over in variants:
        try:
            static = StepStatic(**{**base, **over})
            step = build_train_step(field_cfgs, rcfg, static)
            # Fresh param copies per variant: the step donates its state,
            # which would delete the shared arrays for the next variant.
            state = init_train_state(
                jax.tree_util.tree_map(jnp.array, params))
            for i in range(3):
                state, metrics = step(state, batch, jax.random.PRNGKey(i))
            sync(metrics["loss"])
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, metrics = step(state, batch,
                                      jax.random.PRNGKey(10 + i))
            sync(metrics["loss"])
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"{name:32s} {ms:8.2f} ms/step", flush=True)
        except Exception as exc:
            print(f"{name:32s} FAILED: "
                  f"{str(exc).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
