"""End-to-end trainer test: both stages + pose refinement + checkpoint/resume
on the synthetic scene (tiny nets/schedules, CPU)."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401

from synthetic_scene import make_scene

from copenerf_tpu.config.loader import load_config
from copenerf_tpu.training.trainer import Trainer


def _tiny_cfg(scene_path, scene_name, out_dir):
    cfg = load_config(None)
    cfg["dataloading"].update({"path": scene_path, "scene": [scene_name]})
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
        "checkpoint_every": 2,
        "eval_pose_every": 2,
        "print_every": 5,
        "depth_bound_update_every_milestones": [0, 0, 0],
    })
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


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return make_scene(str(root), n_frames=10, h=48, w=64)


def test_full_two_stage_training(scene, tmp_path):
    path, name = scene
    out_dir = str(tmp_path / "out")
    cfg = _tiny_cfg(path, name, out_dir)
    trainer = Trainer(cfg, verbose=True)
    trainer.train()  # epochs 0..7, stage 2 from epoch 3

    assert trainer.query_in_canonical_space
    # Stage-2 artifacts exist.
    assert os.path.isfile(os.path.join(out_dir, "models", "refine_pose.npz"))
    assert os.path.isfile(os.path.join(out_dir, "models", "weights",
                                       "model.ckpt.npz"))
    # Stage-1 extraction wrote one depth per train view.
    ddir = os.path.join(out_dir, "extraction_stage1", "depths")
    assert len([f for f in os.listdir(ddir) if f.endswith(".npz")]) == \
        trainer.train_field.N_imgs
    # Scalar log has per-epoch psnr entries and they are finite.
    scalars = [json.loads(line) for line in
               open(os.path.join(out_dir, "logs", "scalars.jsonl"))]
    psnrs = [s["value"] for s in scalars if s["tag"] == "stats/psnr"]
    assert len(psnrs) >= 8
    assert np.all(np.isfinite(psnrs))


def test_resume_from_checkpoint(scene, tmp_path):
    path, name = scene
    out_dir = str(tmp_path / "out_resume")
    cfg = _tiny_cfg(path, name, out_dir)
    t1 = Trainer(cfg, verbose=False)
    t1.train(max_epochs=3)  # stops before stage 2
    t1.save_checkpoint()
    it_before, epoch_before = t1.it, t1.epoch_it

    t2 = Trainer(cfg, verbose=False)
    assert t2.epoch_it == epoch_before
    assert t2.it == it_before
    # Params restored bit-exact.
    a = np.asarray(t1.state["params"]["sdf"]["lin0"]["v"])
    b = np.asarray(t2.state["params"]["sdf"]["lin0"]["v"])
    np.testing.assert_array_equal(a, b)
    # Continue across the stage-2 boundary.
    t2.train(max_epochs=2)
    assert t2.epoch_it >= 3


def test_nan_loss_abort(scene, tmp_path):
    """A poisoned parameter set must abort training with the NaN guard
    (reference model/training.py:532-533)."""
    import jax.numpy as jnp

    path, name = scene
    cfg = _tiny_cfg(path, name, str(tmp_path / "nan_out"))
    trainer = Trainer(cfg, verbose=False)
    params = trainer.state["params"]
    params["sdf"]["lin0"]["b"] = jnp.full_like(params["sdf"]["lin0"]["b"],
                                               np.nan)
    with pytest.raises(FloatingPointError):
        trainer.train(max_epochs=1)


def test_check_sentinels():
    from copenerf_tpu.utils.checks import check_params, check_tensor

    good = {"a": np.ones((3,)), "b": {"c": np.zeros((2, 2))}}
    assert check_params(good) == []
    bad = {"a": np.array([1.0, np.nan])}
    assert check_params(bad) == ["['a']"]
    assert not check_tensor(np.ones(3), "x")
    assert check_tensor(np.array([np.inf]), "y")


def test_old_per_leaf_adam_checkpoint_migrates(scene, tmp_path):
    """Pre-flat-buffer checkpoints stored Adam moments as per-leaf pytrees;
    init_train_state now keeps ONE flat vector per optimizer. A trainer
    resuming from the old format must continue BIT-identically via
    migrate_train_state (ravel in tree-leaves order == ravel_pytree's
    layout) and then train normally."""
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from copenerf_tpu.training.checkpoints import save_checkpoint

    path, name = scene
    out_dir = str(tmp_path / "out_migrate")
    cfg = _tiny_cfg(path, name, out_dir)
    t1 = Trainer(cfg, verbose=False)
    params = t1.state["params"]
    fields = {k: params[k] for k in ("sdf", "color", "variance")}
    rng = np.random.RandomState(5)

    def noise_like(tree):
        return jax.tree_util.tree_map(
            lambda p: jnp.asarray(np.asarray(rng.rand(*p.shape),
                                             np.float32)),
            tree)

    old_state = {
        "params": params,
        "opt_fields": (jnp.asarray(17, jnp.int32), noise_like(fields),
                       noise_like(fields)),
        "opt_motion": (jnp.asarray(17, jnp.int32),
                       noise_like({"motion": params["motion"]}),
                       noise_like({"motion": params["motion"]})),
    }
    save_checkpoint(out_dir, old_state, {"epoch_it": 1, "it": 41})

    t2 = Trainer(cfg, verbose=False)
    assert t2.checkpoint_loaded and t2.it == 41
    count, mu, nu = t2.state["opt_fields"]
    assert mu.ndim == 1  # migrated to the flat-buffer format
    assert int(count) == 17
    np.testing.assert_array_equal(
        np.asarray(mu), np.asarray(ravel_pytree(old_state["opt_fields"][1])[0]))
    np.testing.assert_array_equal(
        np.asarray(nu), np.asarray(ravel_pytree(old_state["opt_fields"][2])[0]))
    mu_m = t2.state["opt_motion"][1]
    assert mu_m.ndim == 1
    np.testing.assert_array_equal(
        np.asarray(mu_m),
        np.asarray(ravel_pytree(old_state["opt_motion"][1])[0]))
    # The migrated state trains (flat tx.update accepts it).
    t2.train(max_epochs=2)
    assert t2.epoch_it >= 1
