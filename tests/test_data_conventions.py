"""Golden tests for the Tanks (COLMAP) and ScanNet dataset conventions
against the reference loaders (`/root/reference/dataloading/common.py` +
the pose-processing chain in `dataset.py:72-123`).

The Co3D convention is covered in test_data.py; these fabricate the other
two on-disk layouts and check that DataField produces the same camera
matrices and c2w poses as the reference numpy pipeline.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

from synthetic_scene import look_at

from copenerf_tpu.data.fields import DataField


def _ref_common():
    """Import the reference dataloading/common.py standalone (it only needs
    numpy/PIL/imageio/cv2/torch, all present)."""
    spec = importlib.util.spec_from_file_location(
        "ref_dl_common", "/root/reference/dataloading/common.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_dl_common"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_images(scene_dir, n, h, w, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(scene_dir, "images", f"frame_{i:04d}.jpg"),
                    img)


def _make_tanks_scene(root, n=6, h=40, w=52, focal=45.0, seed=0):
    base = os.path.join(root, "tanks_synth")
    scene_dir = os.path.join(base, "scene0")
    _write_images(scene_dir, n, h, w, seed)
    rng = np.random.RandomState(seed + 1)
    rows = []
    for i in range(n):
        ang = -0.3 + 0.6 * i / (n - 1)
        eye = np.array([2.0 * np.sin(ang), 0.2 * rng.randn(),
                        -2.0 * np.cos(ang)])
        c2w = look_at(eye, (0, 0, 0))[:3, :4]
        # LLFF stores [-y, x, z] columns relative to the c2w convention used
        # by the post-load swap; invert that swap so the loaded result is the
        # look_at pose: loader does [p1, -p0, p2] => store [-c1, c0, c2].
        p = np.stack([-c2w[:, 1], c2w[:, 0], c2w[:, 2], c2w[:, 3]], axis=1)
        hwf = np.array([[h], [w], [focal]], np.float64)
        mat = np.concatenate([p, hwf], axis=1)  # (3, 5)
        near, far = 1.2 + 0.2 * rng.rand(), 5.0 + rng.rand()
        rows.append(np.concatenate([mat.reshape(-1), [near, far]]))
    np.save(os.path.join(scene_dir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    return base, "scene0"


@pytest.fixture(scope="module", params=[False, True],
                ids=["plain", "spherify"])
def tanks_pair(request, tmp_path_factory):
    spherify = request.param
    root = str(tmp_path_factory.mktemp("tanks"))
    base, name = _make_tanks_scene(root)
    field = DataField(model_path=base, scene_name=[name], mode="all",
                      spherify=spherify, load_ref_img=True,
                      resize_factor=None, crop_size=0,
                      random_ref_interval=[1], load_gt_depth=False,
                      load_colmap_poses=True, sample_rate=4,
                      resolution=[40, 52])
    return field, base, name, spherify


def _ref_tanks_chain(load_dir, spherify):
    ref = _ref_common()
    poses, bds, imgs, names, crop_ratio, fcf = ref._load_data(
        load_dir, factor=None, crop_size=0, load_colmap_poses=True)
    poses = np.concatenate(
        [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
    poses = np.moveaxis(poses, -1, 0).astype(np.float32)
    bds = np.moveaxis(bds, -1, 0).astype(np.float32)
    sc = 1.0 / (bds.min() * 0.75)
    poses[:, :3, 3] *= sc
    bds *= sc
    poses = ref.recenter_poses(poses)
    if spherify:
        poses, _, bds = ref.spherify_poses(poses, bds)
    input_poses = poses.astype(np.float32)
    focal = input_poses[0, :3, -1][2]
    bottom = np.tile(np.array([[0, 0, 0, 1]], np.float32), (len(poses), 1, 1))
    c2ws = np.concatenate([input_poses[:, :3, :4], bottom], 1)
    original_h, original_w = imgs.shape[0], imgs.shape[1]
    return c2ws, focal, fcf, (original_h, original_w)


def test_tanks_poses_match_reference(tanks_pair):
    field, base, name, spherify = tanks_pair
    load_dir = os.path.join(base, name)
    c2ws_ref, focal_ref, fcf, (oh, ow) = _ref_tanks_chain(load_dir, spherify)
    np.testing.assert_allclose(field.c2ws_all, c2ws_ref, rtol=1e-5,
                               atol=1e-5)
    fx = focal_ref / fcf
    k_ref = np.array([[2 * fx / ow, 0, 0, 0], [0, -2 * fx / oh, 0, 0],
                      [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
    np.testing.assert_allclose(field.K[0], k_ref, rtol=1e-6, atol=1e-6)
    assert field.K.shape[0] == len(c2ws_ref)
    np.testing.assert_allclose(field.focal, fx, rtol=1e-6)


def test_tanks_split_matches_reference_rule(tanks_pair):
    field, *_ = tanks_pair
    ids = np.arange(6)
    i_test = ids[2::4]  # sample_rate 4 -> ids[sample_rate//2::sample_rate]
    np.testing.assert_array_equal(field.i_test, i_test)
    np.testing.assert_array_equal(
        field.i_train, [i for i in ids if i not in i_test])


def _make_scannet_scene(root, n=5, h=36, w=48, seed=3):
    base = os.path.join(root, "scannet_synth")
    scene_dir = os.path.join(base, "scene0")
    _write_images(scene_dir, n, h, w, seed)
    rng = np.random.RandomState(seed)
    intr = np.eye(4)
    intr[0, 0], intr[1, 1] = 55.0, 52.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    np.save(os.path.join(scene_dir, "intrinsic.npy"), intr)
    poses = []
    for i in range(n):
        c2w = look_at(np.array([0.1 * i, 0.05 * rng.randn(), -2.0]),
                      (0, 0, 0))
        poses.append(c2w)
    np.save(os.path.join(scene_dir, "pose.npy"),
            np.stack(poses).astype(np.float32))
    return base, "scene0", np.stack(poses).astype(np.float32), intr


def test_scannet_convention(tmp_path):
    base, name, poses, intr = _make_scannet_scene(str(tmp_path))
    field = DataField(model_path=base, scene_name=[name], mode="all",
                      spherify=False, load_ref_img=True, resize_factor=None,
                      crop_size=0, random_ref_interval=[1],
                      load_gt_depth=False, load_colmap_poses=False,
                      sample_rate=4, resolution=[36, 48])
    # Reference dataset.py:150-154: c2w = pose @ diag(1, -1, -1, 1).
    flip = np.diag([1, -1, -1, 1]).astype(np.float32)
    np.testing.assert_allclose(field.c2ws_all, poses @ flip, rtol=1e-6,
                               atol=1e-6)
    # K from the single shared intrinsic (dataset.py:113-123).
    fx, fy = intr[0, 0], intr[1, 1]
    k_ref = np.array([[2 * fx / 48, 0, 0, 0], [0, -2 * fy / 36, 0, 0],
                      [0, 0, -1, 0], [0, 0, 0, 1]], np.float32)
    np.testing.assert_allclose(field.K[0], k_ref, rtol=1e-6, atol=1e-6)
