"""Isosurface extraction: C++ kernel vs numpy fallback vs analytic sphere."""

import numpy as np
import pytest

import conftest  # noqa: F401

from copenerf_tpu.mesher.marching_cubes import (_get_lib,
                                                _marching_tetrahedra_numpy,
                                                extract_geometry,
                                                marching_cubes)


def _sphere_grid(n=32, r=0.6):
    xs = np.linspace(-1, 1, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - r


def test_cpp_library_builds():
    assert _get_lib() is not None, "C++ mesher failed to build"


def test_sphere_surface_radius():
    n = 32
    grid = _sphere_grid(n)
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    assert tris.max() < len(verts)
    # Map back to world coords and check radius ~ 0.6.
    world = verts / (n - 1) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
    assert radii.std() < 0.02


def test_numpy_fallback_matches_cpp():
    grid = _sphere_grid(16)
    v_c, t_c = marching_cubes(grid, 0.0)
    v_n, t_n = _marching_tetrahedra_numpy(grid, 0.0)
    assert len(t_c) == len(t_n)
    # Same welded vertex set (order may differ).
    sc = np.array(sorted(map(tuple, np.round(v_c, 4))))
    sn = np.array(sorted(map(tuple, np.round(v_n, 4))))
    np.testing.assert_allclose(sc, sn, atol=1e-3)


def test_extract_geometry_world_coords():
    def query(pts):
        return np.linalg.norm(pts, axis=-1) - 0.5

    verts, tris = extract_geometry([-1, -1, -1], [1, 1, 1], 48, 0.0, query)
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.01)
