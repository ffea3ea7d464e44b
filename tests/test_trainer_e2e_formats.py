"""End-to-end train -> eval on Tanks- and ScanNet-FORMAT scenes.

The data conventions are golden-tested at load level
(test_data_conventions.py); these tests additionally flow each on-disk
layout through the FULL pipeline — two-stage training (incl. pose
refinement) and the complete evaluator (test-time pose optimization,
chunked render, NVS/depth/pose metrics, results.txt + extraction dump) —
matching the reference's primary usage
(/root/reference/dataloading/dataset.py:72-123, train.py, eval.py).
Tiny nets/schedules; quality is NOT asserted beyond finiteness — this is
pipeline-execution coverage.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from synthetic_scene import make_scene  # noqa: F401  (sibling import style)
from copenerf_tpu.data.synthetic import make_scene_scannet, make_scene_tanks

from copenerf_tpu.config.loader import load_config
from copenerf_tpu.evaluation.evaluator import Evaluator
from copenerf_tpu.training.trainer import Trainer


def _tiny_cfg(scene_path, scene_name, out_dir, *, spherify, load_gt_depth):
    cfg = load_config(None)
    cfg["dataloading"].update({
        "path": scene_path, "scene": [scene_name], "spherify": spherify,
        "load_gt_depth": load_gt_depth, "sample_rate": 4,
    })
    cfg["rendering"]["depth_range"] = [0.5, 3.5]
    cfg["training"].update({
        "out_dir": out_dir,
        "original_resolution": [48, 64],
        "resolution": [48, 64],
        "vis_resolution": [24, 32],
        "n_training_points": 64,
        "patch_size": 4,
        "scheduling_start": 5,
        "scheduling_epoch": 3,
        "start_query_world_epoch": 3,
        "end_smooth_epoch": 100,
        "nb_warm_up_it": 10,
        "pretrained_sdf_path": None,
        "pose_refine_epochs": 3,
        "checkpoint_every": 4,
        "eval_pose_every": 2,
        "print_every": 5,
        "depth_bound_update_every_milestones": [0, 0, 0],
        "render_chunk": 1024,
    })
    cfg["eval"]["eval_pose_epoch"] = 3
    cfg["neus_sdf_network"].update({"d_hidden": 64, "n_layers": 4,
                                    "skip_in": [2], "d_out": 33})
    cfg["neus_rendering_network"].update({"d_feature": 32, "d_hidden": 32,
                                          "n_layers": 2})
    cfg["motion_network"].update({"d_hidden": 32, "n_layers": 2,
                                  "skip_in": [1]})
    cfg["neus_nerf"].update({"D": 2, "W": 32})
    cfg["neus_renderer"].update({"n_samples": 16, "n_importance": 16,
                                 "up_sample_steps": 2})
    return cfg


def _run_pipeline(cfg, out_dir, expect_depth_metrics):
    trainer = Trainer(cfg, verbose=False)
    trainer.train()
    assert trainer.query_in_canonical_space          # stage 2 reached
    assert os.path.isfile(os.path.join(out_dir, "models",
                                       "refine_pose.npz"))

    results = Evaluator(cfg, verbose=False).eval(store_output=True)
    assert np.isfinite(results["PSNR"]) and results["PSNR"] > 0
    assert np.isfinite(results["SSIM"])
    for k in ("ate", "rpe_trans", "rpe_rot"):
        assert np.isfinite(results[k]), (k, results)
    if expect_depth_metrics:
        assert "abs_rel" in results and np.isfinite(results["abs_rel"])
    assert os.path.isfile(os.path.join(out_dir, "results.txt"))
    return results


@pytest.mark.slow
def test_tanks_format_end_to_end(tmp_path):
    """poses_bounds.npy -> axis swap -> bd rescale -> recenter -> spherify
    -> two-stage training -> full eval (the reference's primary Tanks
    path, dataset.py:72-104 with configs/default.yaml spherify: True)."""
    path, name = make_scene_tanks(str(tmp_path), n_frames=10, h=48, w=64)
    out_dir = str(tmp_path / "out")
    cfg = _tiny_cfg(path, name, out_dir, spherify=True, load_gt_depth=False)
    results = _run_pipeline(cfg, out_dir, expect_depth_metrics=False)
    # Tanks loads no GT depth -> no depth metrics in the result dict.
    assert "abs_rel" not in results


@pytest.mark.slow
def test_scannet_format_end_to_end(tmp_path):
    """intrinsic.npy + flipped pose.npy + gt_depth -> two-stage training ->
    full eval INCLUDING the 7 depth metrics (dataset.py:113-123,150-154)."""
    path, name = make_scene_scannet(str(tmp_path), n_frames=10, h=48, w=64)
    out_dir = str(tmp_path / "out")
    cfg = _tiny_cfg(path, name, out_dir, spherify=False, load_gt_depth=True)
    results = _run_pipeline(cfg, out_dir, expect_depth_metrics=True)
    for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"):
        assert k in results, k
