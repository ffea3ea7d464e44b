"""Synthetic Co3D-convention scene fabrication (demos, tests, smoke runs).

Renders an analytic lambertian sphere from a smoothly moving camera and
writes the file layout the data layer expects: ``images/*.jpg``,
``intrinsic.npy`` (per-frame), ``pose.npy`` (world-to-camera, as Co3D stores
it), ``gt_depth/depth_%06d.npz``.
"""

import os

import numpy as np


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


def render_sphere(c2w, h, w, fx, fy, radius=0.5, center=(0, 0, 0)):
    """Ray-trace a diffuse sphere; returns (rgb (h, w, 3), depth (h, w))."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs_cam = np.stack([(xs - w / 2) / fx, (ys - h / 2) / fy,
                         np.ones_like(xs, np.float64)], -1)
    rd = dirs_cam @ c2w[:3, :3].T
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = c2w[:3, 3]
    oc = ro - np.asarray(center, np.float64)
    b = np.sum(rd * oc, -1)
    c = np.sum(oc * oc) - radius ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    pts = ro + rd * t[..., None]
    normal = (pts - center) / radius
    light = np.array([0.5, -0.8, 0.3])
    light = light / np.linalg.norm(light)
    lam = np.clip(np.sum(normal * light, -1), 0, 1)
    albedo = 0.5 + 0.5 * np.stack(
        [np.sin(3 * pts[..., 0]), np.cos(3 * pts[..., 1]),
         np.sin(2 * pts[..., 2])], -1)
    rgb = np.where(hit[..., None], albedo * (0.3 + 0.7 * lam[..., None]),
                   0.12 + 0.75 * np.stack([xs / w, ys / h,
                                           0.5 * np.ones_like(xs)], -1))
    depth = np.where(hit, t, 4.0)
    return np.clip(rgb, 0, 1), depth


def make_scene(root, n_frames=12, h=60, w=80, write_depth=True):
    """Create ``<root>/co3d_synth/scene0`` and return (path, scene_name)."""
    import cv2

    base = os.path.join(root, "co3d_synth")
    scene_dir = os.path.join(base, "scene0")
    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    if write_depth:
        os.makedirs(os.path.join(scene_dir, "gt_depth"), exist_ok=True)

    fx = fy = 70.0
    intr = np.eye(3)
    intr[0, 0], intr[1, 1] = fx, fy
    intr[0, 2], intr[1, 2] = w / 2, h / 2

    poses_w2c = []
    intr_list = []
    for i in range(n_frames):
        ang = -0.35 + 0.7 * i / max(n_frames - 1, 1)
        eye = np.array([1.8 * np.sin(ang), 0.25 * np.sin(2 * ang),
                        -1.8 * np.cos(ang)])
        c2w = look_at(eye, (0, 0, 0))
        rgb, depth = render_sphere(c2w, h, w, fx, fy)
        img8 = (rgb * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(scene_dir, "images", f"frame_{i:04d}.jpg"),
                    cv2.cvtColor(img8, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 97])
        if write_depth:
            np.savez(os.path.join(scene_dir, "gt_depth",
                                  f"depth_{str(i).zfill(6)}.npz"),
                     pred=depth.astype(np.float32))
        poses_w2c.append(np.linalg.inv(c2w))
        intr_list.append(intr)

    np.save(os.path.join(scene_dir, "pose.npy"),
            np.stack(poses_w2c).astype(np.float32))
    np.save(os.path.join(scene_dir, "intrinsic.npy"),
            np.stack(intr_list).astype(np.float32))
    return base, "scene0"
