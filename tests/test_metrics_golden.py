"""Golden-value tests: metrics + trajectory helpers vs the PyTorch reference.

Covers the parity of:
  * pose metrics (Umeyama Sim(3) alignment, ATE, RPE) vs
    ``utils_poses/comp_ate.py`` + ``utils_poses/align_traj.py`` + ``ATE/``;
  * PSNR/SSIM vs ``co3d_metric.py`` (CF3DGS-compatible);
  * trajectory generation (slerp/b-spline interpolation, spiral path, NDC
    rays) vs ``model/common.py``.
"""

import sys
import types

import numpy as np
import pytest
import torch

from conftest import add_reference_to_path, has_reference

from copenerf_tpu.evaluation import metrics_image
from copenerf_tpu.evaluation.metrics_pose import (align_ate_c2b_use_a2b,
                                                  compute_ate, compute_rpe)
from copenerf_tpu.ops import trajectories

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference tree unavailable")


def _random_c2ws(n, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    from scipy.spatial.transform import Rotation

    rots = Rotation.random(n, random_state=rng).as_matrix()
    out = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
    out[:, :3, :3] = rots
    out[:, :3, 3] = rng.randn(n, 3) * scale
    return out.astype(np.float64)


# ---------------------------------------------------------------------------
# Pose metrics
# ---------------------------------------------------------------------------

def test_pose_alignment_and_metrics_match_reference():
    add_reference_to_path()
    from utils_poses.align_traj import align_ate_c2b_use_a2b as ref_align
    from utils_poses.comp_ate import compute_ATE as ref_ate
    from utils_poses.comp_ate import compute_rpe as ref_rpe

    gt = _random_c2ws(24, seed=1)
    # pred = noisy, re-scaled, re-oriented copy of gt.
    pred = _random_c2ws(24, seed=2, scale=0.1)
    pred[:, :3, 3] = 0.37 * gt[:, :3, 3] + 0.05 * pred[:, :3, 3] + 0.3

    ref_aligned = ref_align(torch.from_numpy(pred), torch.from_numpy(gt))
    ours_aligned = align_ate_c2b_use_a2b(pred, gt)
    np.testing.assert_allclose(ours_aligned,
                               ref_aligned.numpy().astype(np.float32),
                               rtol=1e-4, atol=1e-5)

    ref_aligned_np = ref_aligned.numpy().astype(np.float64)
    ref_ate_val = ref_ate(gt, ref_aligned_np)
    ours_ate = compute_ate(gt, np.asarray(ours_aligned, np.float64))
    np.testing.assert_allclose(ours_ate, ref_ate_val, rtol=1e-4)

    ref_rpe_t, ref_rpe_r = ref_rpe(gt, ref_aligned_np)
    ours_t, ours_r = compute_rpe(gt, np.asarray(ours_aligned, np.float64))
    np.testing.assert_allclose(ours_t, ref_rpe_t, rtol=1e-3)
    np.testing.assert_allclose(ours_r, ref_rpe_r, rtol=1e-3)


# ---------------------------------------------------------------------------
# Image metrics (CF3DGS psnr/ssim)
# ---------------------------------------------------------------------------

def _import_co3d_metric():
    add_reference_to_path()
    # co3d_metric imports lpipsPyTorch -> torchvision (absent); stub it.
    if "lpipsPyTorch.modules.lpips" not in sys.modules:
        pkg = types.ModuleType("lpipsPyTorch")
        mod = types.ModuleType("lpipsPyTorch.modules")
        lp = types.ModuleType("lpipsPyTorch.modules.lpips")
        lp.LPIPS = object
        sys.modules.setdefault("lpipsPyTorch", pkg)
        sys.modules.setdefault("lpipsPyTorch.modules", mod)
        sys.modules["lpipsPyTorch.modules.lpips"] = lp
    import co3d_metric

    return co3d_metric


def test_psnr_ssim_match_reference():
    co3d_metric = _import_co3d_metric()
    rng = np.random.RandomState(0)
    a = rng.rand(3, 37, 53).astype(np.float32)
    b = np.clip(a + rng.randn(3, 37, 53).astype(np.float32) * 0.07, 0, 1)

    ref_psnr = co3d_metric.psnr(torch.from_numpy(a)[None],
                                torch.from_numpy(b)[None]).mean().item()
    ours_psnr = float(metrics_image.psnr(a, b))
    np.testing.assert_allclose(ours_psnr, ref_psnr, rtol=1e-4)

    ref_ssim = co3d_metric.ssim(torch.from_numpy(a)[None],
                                torch.from_numpy(b)[None]).item()
    ours_ssim = float(metrics_image.ssim(a, b))
    np.testing.assert_allclose(ours_ssim, ref_ssim, rtol=1e-4, atol=1e-5)


def test_ssim_matches_reference_on_renderlike_degradations():
    """Settles the round-3 SSIM-vs-PSNR question at the metric level: on
    e2e-render-like degradations of the actual synthetic-scene content
    (iid noise at the PSNR-35 level, blur, sub-pixel shift — the error
    modes a NeRF render exhibits), our SSIM equals the reference
    ``co3d_metric.ssim`` to <1e-4. Any odd SSIM/PSNR pairing in an e2e
    run is therefore a property of the images, not a metric bug."""
    import scipy.ndimage as ndi

    from copenerf_tpu.data.synthetic import look_at, render_sphere

    co3d_metric = _import_co3d_metric()
    rgb, _ = render_sphere(look_at((0.3, 0.1, -1.8), (0, 0, 0)),
                           96, 128, 70.0, 70.0)
    rng = np.random.RandomState(0)
    variants = [
        np.clip(rgb + rng.randn(*rgb.shape) * 0.0178, 0, 1),  # PSNR ~35
        np.clip(ndi.gaussian_filter(rgb, (1.2, 1.2, 0)), 0, 1),
        np.clip(ndi.shift(rgb, (0.5, 0.5, 0), order=1, mode="nearest"),
                0, 1),
    ]
    gt = np.transpose(rgb, (2, 0, 1)).astype(np.float32)
    for v in variants:
        pred = np.transpose(v, (2, 0, 1)).astype(np.float32)
        ref = co3d_metric.ssim(torch.from_numpy(pred)[None],
                               torch.from_numpy(gt)[None]).item()
        ours = float(metrics_image.ssim(pred, gt))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Trajectory helpers (model/common.py)
# ---------------------------------------------------------------------------

def _import_ref_common():
    add_reference_to_path()
    import model.common as ref_common

    return ref_common


def test_interp_poses_matches_reference():
    ref_common = _import_ref_common()
    c2ws = _random_c2ws(7, seed=3).astype(np.float32)
    ref = ref_common.interp_poses(torch.from_numpy(c2ws), 25).numpy()
    ours = trajectories.interp_poses(c2ws, 25)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_interp_poses_bspline_matches_reference():
    ref_common = _import_ref_common()
    c2ws = _random_c2ws(8, seed=4).astype(np.float32)
    times = np.linspace(0.0, 1.0, 8)
    ref = ref_common.interp_poses_bspline(torch.from_numpy(c2ws), 30, times,
                                          3).numpy()
    ours = trajectories.interp_poses_bspline(c2ws, 30, times, 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_generate_spiral_matches_reference():
    ref_common = _import_ref_common()
    c2ws = _random_c2ws(9, seed=5).astype(np.float32)
    # keep cameras roughly coherent so normalize() stays well-conditioned
    c2ws[:, :3, :3] = c2ws[0, :3, :3]
    bds = np.array([1.0, 6.0])
    hwf = np.broadcast_to(np.array([[120.0], [160.0], [100.0]],
                                   np.float32), (9, 3, 1)).copy()
    ref = ref_common.generate_spiral_nerf(torch.from_numpy(c2ws), bds, 40,
                                          hwf).numpy()
    ours = trajectories.generate_spiral_path(c2ws, bds, 40, hwf)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ndc_rays_match_reference():
    ref_common = _import_ref_common()
    rng = np.random.RandomState(6)
    rays_o = rng.randn(64, 3).astype(np.float32)
    rays_d = rng.randn(64, 3).astype(np.float32)
    rays_d[:, 2] = -np.abs(rays_d[:, 2]) - 0.2
    fxfy = (333.0, 444.0)
    ref_o, ref_d = ref_common.get_ndc_rays_fxfy(
        fxfy, 1.0, torch.from_numpy(rays_o), torch.from_numpy(rays_d))
    ours_o, ours_d = trajectories.get_ndc_rays_fxfy(fxfy, 1.0, rays_o, rays_d)
    np.testing.assert_allclose(ours_o, ref_o.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_d, ref_d.numpy(), rtol=1e-4, atol=1e-5)
