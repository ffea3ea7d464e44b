"""Data-layer tests on a fabricated Co3D-convention scene."""

import numpy as np
import pytest

import conftest  # noqa: F401

from synthetic_scene import make_scene

from copenerf_tpu.data.fields import DataField, get_data_fields


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_scene(str(root), n_frames=12, h=60, w=80)


def _field(scene, mode="train", **kw):
    path, name = scene
    args = dict(model_path=path, scene_name=[name], mode=mode,
                spherify=False, resize_factor=None, crop_size=0,
                random_ref_interval=[1, 2, 3], load_gt_depth=True,
                sample_rate=8, resolution=[48, 64])
    args.update(kw)
    return DataField(**args)


def test_split_and_shapes(scene):
    f = _field(scene)
    assert list(f.i_test) == [4]  # ids[4::8] for 12 frames
    assert len(f.i_train) == 11
    assert f.imgs.shape == (11, 3, 48, 64)
    assert f.all_imgs.shape == (12, 3, 48, 64)
    # test frames zeroed in train mode
    assert np.all(f.all_imgs[4] == 0)
    assert f.K.shape == (12, 4, 4)
    assert f.c2ws.shape == (11, 4, 4)
    assert f.total_nb_images == 12
    assert len(f.gt_depths) == 12


def test_camera_mat_convention(scene):
    f = _field(scene)
    # NDC-style K from pre-resize dims (80x60) with fx=fy=70.
    np.testing.assert_allclose(f.K[0][0, 0], 2 * 70.0 / 80)
    np.testing.assert_allclose(f.K[0][1, 1], -2 * 70.0 / 60)
    assert f.K[0][2, 2] == -1


def test_co3d_pose_normalization(scene):
    f = _field(scene)
    # Translations are centered over train split and unit-normalized.
    t = f.c2ws_all[:, :3, 3]
    np.testing.assert_allclose(t[f.i_train].mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t[f.i_train]), 1.0, rtol=1e-5)
    # Rotations stay orthonormal after the Y-flip.
    r = f.c2ws_all[:, :3, :3]
    eye = np.broadcast_to(np.eye(3), r.shape)
    np.testing.assert_allclose(r @ r.transpose(0, 2, 1), eye, atol=1e-4)


def test_eval_mode_selects_test_split(scene):
    f = _field(scene, mode="eval")
    assert f.N_imgs == 1
    assert list(f.idx_list) == [4]
    # eval mode keeps all frames intact
    assert not np.all(f.all_imgs[4] == 0)


def test_ref_tensors_masks(scene):
    f = _field(scene)
    # target 3: refs 4 (test -> skipped), 5, 6
    imgs, idxs, in_list, valid, ref_k = f.ref_tensors(3, 3)
    assert in_list.tolist() == [0.0, 1.0, 1.0]
    assert valid.tolist() == [0.0, 1.0, 1.0]
    # target 10: refs 11, 12 (out of video), 13 (out of video)
    imgs, idxs, in_list, valid, ref_k = f.ref_tensors(10, 3)
    assert in_list.tolist() == [1.0, 1.0, 1.0]
    assert valid.tolist() == [1.0, 0.0, 0.0]
    assert idxs.max() <= 11


def test_reference_compatible_load_dict(scene):
    f = _field(scene)
    data = f.load(3)
    assert data["idx"] == 3
    assert data["ref_idxs"] == [5, 6]  # 4 skipped (test frame)
    assert data[None].shape == (3, 48, 64)
    assert data["camera_mat"].shape == (4, 4)


def test_get_data_fields_from_cfg(scene):
    path, name = scene
    from copenerf_tpu.config.loader import load_config

    cfg = load_config(None)
    cfg["dataloading"]["path"] = path
    cfg["dataloading"]["scene"] = [name]
    cfg["training"]["resolution"] = [48, 64]
    fields = get_data_fields(cfg, "train")
    assert fields["img"].N_imgs == 11
