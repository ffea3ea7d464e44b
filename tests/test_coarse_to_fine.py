"""Trainer coarse-to-fine resolution schedule: dataset rebuild at milestones,
smoothness losses scaled by 1/2^s (reference train.py:273-286,354-357,
model/training.py:519-525)."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from synthetic_scene import make_scene

from copenerf_tpu.config.loader import load_config
from copenerf_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("c2f")
    return make_scene(str(root), n_frames=8, h=48, w=64)


def test_resolution_schedule(scene, tmp_path):
    path, name = scene
    cfg = load_config(None)
    cfg["dataloading"].update({"path": path, "scene": [name]})
    cfg["rendering"]["depth_range"] = [0.5, 3.5]
    cfg["training"].update({
        "out_dir": str(tmp_path / "out"),
        "original_resolution": [48, 64],
        "resolution": [48, 64],
        "vis_resolution": [24, 32],
        "n_training_points": 32,
        "patch_size": 4,
        "scheduling_start": 4,
        "scheduling_epoch": 0,
        "start_query_world_epoch": 1000,   # stay in stage 1
        "end_smooth_epoch": 1000,
        "nb_warm_up_it": 5,
        "pretrained_sdf_path": None,
        "checkpoint_every": 100,
        "eval_pose_every": 100,
        "print_every": 100,
        "depth_bound_update_every_milestones": [0, 0, 0],
        "coarse_to_fine_scheduler": {2: [0, 1], 1: [2, int(1e10)]},
    })
    cfg["neus_sdf_network"].update({"d_hidden": 64, "n_layers": 4,
                                    "skip_in": [2], "d_out": 33})
    cfg["neus_rendering_network"].update({"d_feature": 32, "d_hidden": 32,
                                          "n_layers": 2})
    cfg["motion_network"].update({"d_hidden": 16, "n_layers": 2,
                                  "skip_in": [1]})
    cfg["neus_nerf"].update({"D": 2, "W": 16})
    cfg["neus_renderer"].update({"n_samples": 4, "n_importance": 4,
                                 "up_sample_steps": 2})

    trainer = Trainer(cfg, verbose=False)
    # prepare_training picks the scale for the starting epoch (0 -> s=2).
    trainer.prepare_training()
    assert trainer.s == 2
    assert trainer.resolution == [24, 32]
    assert trainer.train_field.imgs.shape[-2:] == (24, 32)

    trainer.train()  # epochs 0..3; milestone at epoch 2 switches to s=1
    assert trainer.s == 1
    assert trainer.resolution == [48, 64]
    assert trainer.train_field.imgs.shape[-2:] == (48, 64)
    # Two distinct step programs were compiled (one per (h, w, s)).
    keys = list(trainer._steps.keys())
    assert len(keys) == 2
    assert {k[-1] for k in keys} == {1, 2}
