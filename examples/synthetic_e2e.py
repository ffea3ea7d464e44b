#!/usr/bin/env python
"""Run the FULL pipeline on a fabricated scene — no dataset download needed.

Builds a synthetic Co3D-convention video (analytic textured sphere, smooth
camera arc, GT poses + depths), trains both stages jointly (local-frame
motion learning, then pose refinement + canonical-space queries), and runs
the complete evaluation (test-time pose optimization, NVS PSNR/SSIM, depth
metrics, Sim(3)-aligned ATE/RPE).

Validated on a single TPU v5e chip: ~16 min wall including compiles, ending
around PSNR ~20 / ATE ~0.08 on held-out views with only 80 epochs at
96x128 (a real training schedule runs thousands of epochs — see
configs/default.yaml).

Usage:  python examples/synthetic_e2e.py [workdir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax"))

from copenerf_tpu.config.loader import load_config
from copenerf_tpu.data.synthetic import make_scene
from copenerf_tpu.evaluation.evaluator import Evaluator
from copenerf_tpu.training.trainer import Trainer


def build_config(workdir: str) -> dict:
    path, name = make_scene(workdir, n_frames=12, h=96, w=128)
    cfg = load_config(None)
    cfg["dataloading"].update({"path": path, "scene": [name]})
    cfg["rendering"]["depth_range"] = [0.5, 3.5]
    cfg["training"].update({
        "out_dir": os.path.join(workdir, "out"),
        "original_resolution": [96, 128],
        "resolution": [96, 128],
        "vis_resolution": [48, 64],
        "n_training_points": 1024,
        "patch_size": 4,
        "scheduling_start": 60,       # stage-2 epochs 60..79
        "scheduling_epoch": 20,
        "start_query_world_epoch": 40,
        "end_smooth_epoch": 10000,
        "nb_warm_up_it": 20,
        "pretrained_sdf_path": None,
        "pose_refine_epochs": 25,
        "checkpoint_every": 20,
        "eval_pose_every": 10,
        "print_every": 20,
        "depth_bound_update_every_milestones": [25, 0, 0],
    })
    cfg["eval"]["eval_pose_epoch"] = 15
    return cfg


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/copenerf_synth"
    os.makedirs(workdir, exist_ok=True)
    cfg = build_config(workdir)
    print("devices:", jax.devices())
    Trainer(cfg, verbose=True).train()
    results = Evaluator(cfg, verbose=True).eval(store_output=True)
    print("RESULTS:", results)


if __name__ == "__main__":
    main()
