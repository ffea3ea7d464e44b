"""Test-side alias: the scene synthesizer lives in the package so demos can
use it too (copenerf_tpu/data/synthetic.py)."""

from copenerf_tpu.data.synthetic import look_at, make_scene, render_sphere

__all__ = ["look_at", "make_scene", "render_sphere"]
