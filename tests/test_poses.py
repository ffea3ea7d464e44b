"""Pose subsystem parity: Lie ops, rotations, motion integration chain."""

import numpy as np
import pytest

import conftest

conftest.add_reference_to_path()

import torch  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self
_orig_tensor_fns = {}


def _patch_cuda_constructors():
    # The reference creates tensors via torch.eye(...).float().cuda() etc.;
    # Tensor.cuda is already identity. torch.linspace(...).cuda handled too.
    pass


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from copenerf_tpu.models import MotionConfig, motion_init  # noqa: E402
from copenerf_tpu.models.torch_io import motion_params_from_torch  # noqa: E402
from copenerf_tpu.poses import (consecutive_relative_poses,  # noqa: E402
                                euler_angles_to_matrix, exp_so3, make_c2w,
                                matrix_to_axis_angle, matrix_to_euler_angles,
                                pose_retriever_all, pose_retriever_apply,
                                pose_retriever_init, se3_inverse,
                                w2c_from_anchor, w2c_mappings)


def test_exp_so3_matches_reference():
    if not conftest.has_reference():
        pytest.skip("no reference")
    from model.common import Exp

    rng = np.random.RandomState(0)
    for _ in range(5):
        r = rng.randn(3).astype(np.float32) * 0.5
        ref = Exp(torch.from_numpy(r)).numpy()
        ours = np.asarray(exp_so3(jnp.asarray(r)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_euler_roundtrip_and_parity():
    if not conftest.has_reference():
        pytest.skip("no reference")
    from utils_poses.pose_pytorch3d import (euler_angles_to_matrix as ref_e2m,
                                            matrix_to_euler_angles as ref_m2e)

    rng = np.random.RandomState(1)
    ang = (rng.rand(8, 3).astype(np.float32) - 0.5) * 2.0
    ref = ref_e2m(torch.from_numpy(ang), convention="XYZ").numpy()
    ours = np.asarray(euler_angles_to_matrix(jnp.asarray(ang), "XYZ"))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    back_ref = ref_m2e(torch.from_numpy(ref), convention="XYZ").numpy()
    back = np.asarray(matrix_to_euler_angles(jnp.asarray(ours), "XYZ"))
    np.testing.assert_allclose(back, back_ref, rtol=1e-4, atol=1e-5)


def test_se3_inverse():
    rng = np.random.RandomState(2)
    r = rng.randn(5, 3).astype(np.float32)
    t = rng.randn(5, 3).astype(np.float32)
    m = np.asarray(make_c2w(jnp.asarray(r), jnp.asarray(t)))
    inv = np.asarray(se3_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.broadcast_to(np.eye(4), (5, 4, 4)),
                               atol=1e-5)


def test_motion_integration_matches_reference():
    if not conftest.has_reference():
        pytest.skip("no reference")
    from model.neus_fields import MotionNetwork

    torch.manual_seed(3)
    net = MotionNetwork(d_out=6, d_in=1, d_hidden=256, n_layers=4,
                        skip_in=[2], multires=6, bias=0.5, scale=1.0,
                        geometric_init=False, weight_norm=True)
    n_images, s = 11, 10
    with torch.no_grad():
        _, rel_list = net.compute_relative_camera_pose(
            target_cam_idx=0, final_ref_cam_idx=n_images - 1,
            total_nb_images=n_images, nb_sample_timestep=s)
        ref_w2c = net.compute_w2c_mappings(rel_list).numpy()

    params = motion_params_from_torch(net.state_dict())
    rel = consecutive_relative_poses(MotionConfig(), params, n_images, s)
    w2c = np.asarray(w2c_mappings(rel))
    np.testing.assert_allclose(w2c, ref_w2c, rtol=1e-4, atol=1e-5)


def test_w2c_from_anchor():
    rng = np.random.RandomState(4)
    rel = np.asarray(make_c2w(jnp.asarray(rng.randn(6, 3) * 0.1),
                              jnp.asarray(rng.randn(6, 3) * 0.1)),
                     np.float32)
    w2c = w2c_mappings(jnp.asarray(rel))
    anchored = np.asarray(w2c_from_anchor(w2c, 3))
    np.testing.assert_allclose(anchored[3], np.eye(4), atol=1e-5)
    # Relative transforms are preserved by re-anchoring.
    a = np.asarray(w2c)
    np.testing.assert_allclose(anchored[5] @ np.linalg.inv(anchored[2]),
                               a[5] @ np.linalg.inv(a[2]), atol=1e-4)


def test_pose_retriever_matches_reference():
    if not conftest.has_reference():
        pytest.skip("no reference")
    from model.poses_retriever import PoseRetriever

    rng = np.random.RandomState(5)
    init = np.asarray(make_c2w(jnp.asarray(rng.randn(4, 3) * 0.2),
                               jnp.asarray(rng.randn(4, 3))), np.float32)
    ref_net = PoseRetriever(4, learn_R=True, learn_t=True,
                            init_c2w=torch.from_numpy(init))
    with torch.no_grad():
        ref_net.r += torch.from_numpy(rng.randn(4, 3).astype(np.float32) * .1)
        ref_net.t += torch.from_numpy(rng.randn(4, 3).astype(np.float32) * .1)

    params = {"r": jnp.asarray(ref_net.r.detach().numpy()),
              "t": jnp.asarray(ref_net.t.detach().numpy())}
    ours_all = np.asarray(pose_retriever_all(params, jnp.asarray(init)))
    for i in range(4):
        ref_pose = ref_net(i).detach().numpy()
        np.testing.assert_allclose(ours_all[i], ref_pose, rtol=1e-5,
                                   atol=1e-5)
        one = np.asarray(pose_retriever_apply(params, jnp.asarray(init), i))
        np.testing.assert_allclose(one, ref_pose, rtol=1e-5, atol=1e-5)
