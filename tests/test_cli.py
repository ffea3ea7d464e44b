"""CLI guard-rail tests: mesh extraction refuses untrained weights, argument
validation, and PLY output portability (advisor findings, round 1)."""

import os
import struct

import numpy as np
import pytest

from copenerf_tpu.cli import extract_mesh_main
from copenerf_tpu.mesher.marching_cubes import save_ply


def _tiny_cfg(tmp_path):
    """Minimal scene + config with an empty out_dir (no checkpoint)."""
    import yaml

    from synthetic_scene import make_scene

    path, name = make_scene(str(tmp_path), n_frames=6, h=24, w=32)
    cfg = {
        "dataloading": {"path": path, "scene": [name]},
        "training": {
            "out_dir": str(tmp_path / "out"),
            "original_resolution": [24, 32],
            "resolution": [24, 32],
        },
        "neus_sdf_network": {"d_hidden": 32, "n_layers": 3},
        "neus_rendering_network": {"d_feature": 16, "d_hidden": 16,
                                   "n_layers": 2},
        "motion_network": {"d_hidden": 16, "n_layers": 2},
        "neus_nerf": {"D": 2, "W": 16},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return str(cfg_path)


def test_extract_mesh_refuses_without_checkpoint(tmp_path):
    """No checkpoint in out_dir -> hard error, never a garbage PLY
    (advisor: silently meshing random init weights)."""
    cfg_path = _tiny_cfg(tmp_path)
    with pytest.raises(SystemExit) as exc_info:
        extract_mesh_main([cfg_path, "--resolution", "16"])
    assert "No checkpoint" in str(exc_info.value)
    assert not os.path.exists(tmp_path / "out" / "mesh.ply")


def test_extract_mesh_rejects_out_of_range_time_step(tmp_path):
    """--time-step is documented as normalized to [-1, 1]; out-of-range
    values are argument errors, not silent out-of-distribution queries."""
    cfg_path = _tiny_cfg(tmp_path)
    for bad in ("1.5", "-2.0"):
        with pytest.raises(SystemExit):
            extract_mesh_main([cfg_path, "--time-step", bad])


def test_save_ply_is_little_endian(tmp_path):
    """The declared binary_little_endian format must hold regardless of host
    byte order: verts/faces written from big-endian arrays still produce a
    little-endian file."""
    verts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]],
                     dtype=np.dtype(">f4"))  # big-endian input
    tris = np.array([[0, 1, 2]], dtype=np.dtype(">i4"))
    path = str(tmp_path / "mesh.ply")
    save_ply(path, verts, tris)

    with open(path, "rb") as f:
        blob = f.read()
    header_end = blob.index(b"end_header\n") + len(b"end_header\n")
    header = blob[:header_end].decode("ascii")
    assert "format binary_little_endian 1.0" in header
    assert "element vertex 3" in header
    assert "element face 1" in header

    body = blob[header_end:]
    got_verts = struct.unpack("<9f", body[:36])
    assert got_verts == tuple(range(9))
    n_idx, = struct.unpack("<B", body[36:37])
    assert n_idx == 3
    assert struct.unpack("<3i", body[37:49]) == (0, 1, 2)
