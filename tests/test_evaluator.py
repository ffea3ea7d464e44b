"""Evaluator end-to-end on the synthetic scene (train tiny -> eval)."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from synthetic_scene import make_scene
from test_trainer_e2e import _tiny_cfg

from copenerf_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_e2e")
    path, name = make_scene(str(root), n_frames=10, h=48, w=64)
    out_dir = str(root / "out")
    cfg = _tiny_cfg(path, name, out_dir)
    cfg["eval"]["eval_pose_epoch"] = 3
    trainer = Trainer(cfg, verbose=False)
    trainer.train()  # through stage 2
    trainer.save_checkpoint()
    return cfg


def test_full_evaluation(trained):
    from copenerf_tpu.evaluation.evaluator import Evaluator

    cfg = trained
    evaluator = Evaluator(cfg, verbose=False)
    result = evaluator.eval(store_output=True)
    assert "PSNR" in result and np.isfinite(result["PSNR"])
    assert "SSIM" in result and -1 <= result["SSIM"] <= 1
    assert "ate" in result and np.isfinite(result["ate"])
    assert {"abs_rel", "rmse", "a1"} <= set(result)  # GT depth present
    out_dir = cfg["training"]["out_dir"]
    assert os.path.isfile(os.path.join(out_dir, "results.txt"))
    n_test = len(evaluator.test_field.i_test)
    imgs = os.listdir(os.path.join(out_dir, "extraction", "images"))
    assert len(imgs) == n_test
    # Pose cache reused on the second run.
    assert os.path.isfile(os.path.join(out_dir, "models", "weights",
                                       "model_eval_pose.npz"))
    result2 = Evaluator(cfg, verbose=False).eval(store_output=False)
    assert np.isclose(result2["ate"], result["ate"], rtol=1e-4)


def test_image_renderer_chunk_cap_is_true_maximum():
    """A non-power-of-two chunk cap is rounded DOWN (HBM safety): the
    doubling loop must never overshoot the configured maximum."""
    import test_train_step as T
    from copenerf_tpu.evaluation.render import ImageRenderer

    r = ImageRenderer(T.FIELD_CFGS, T.RCFG, chunk=48000)
    assert r.chunk == 32768          # largest pow2 multiple of 1024 <= 48000
    r_small = ImageRenderer(T.FIELD_CFGS, T.RCFG, chunk=512)
    assert r_small.chunk == 512      # sub-1024 values honored


def test_config_single_source_of_truth():
    """configs/default.yaml and the packaged defaults must be ONE file
    (round-2 review: the two copies had drifted)."""
    import os

    import yaml

    root = os.path.join(os.path.dirname(__file__), "..")
    repo_copy = os.path.join(root, "configs", "default.yaml")
    packaged = os.path.join(root, "copenerf_tpu", "config", "defaults.yaml")
    assert os.path.islink(repo_copy), "configs/default.yaml must be a symlink"
    assert os.path.realpath(repo_copy) == os.path.realpath(packaged)
    cfg = yaml.safe_load(open(repo_copy))
    assert cfg["training"]["fused_kernels"] == "auto"
    assert cfg["training"]["backup_source"] is True


def test_image_renderer_on_device_pixels_match_multichunk():
    """Pixel coordinates are generated on-device from (start, h, w); a
    multi-chunk render must equal a single-chunk render at an odd (padded)
    resolution."""
    import numpy as np

    import jax
    import test_train_step as T
    from copenerf_tpu.evaluation.render import ImageRenderer
    from copenerf_tpu.models import init_all_fields

    params = init_all_fields(jax.random.PRNGKey(0), T.FIELD_CFGS)
    h, w = 26, 30   # 780 px: pads, and chunk=512 forces two chunks
    cam = np.array([[2 * 30.0 / w, 0, 0, 0], [0, -2 * 30.0 / h, 0, 0],
                    [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
    eye = np.eye(4, dtype=np.float32)
    args = (params, cam, eye, eye, 0.0, (h, w), (0.5, 3.5), 1.0)
    multi = ImageRenderer(T.FIELD_CFGS, T.RCFG, chunk=512).render_image(*args)
    single = ImageRenderer(T.FIELD_CFGS, T.RCFG,
                           chunk=1024).render_image(*args)
    for k in ("color", "depth", "normal", "weighted_z", "depth_highest"):
        np.testing.assert_allclose(multi[k], single[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
        assert np.isfinite(multi[k]).all()
