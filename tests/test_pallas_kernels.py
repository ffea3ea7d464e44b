"""Pallas kernel parity (interpreter mode on CPU) vs the jnp reference path."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from copenerf_tpu.models import SDFConfig, sdf_init, sdf_value
from copenerf_tpu.ops.pallas.sdf_mlp import sdf_value_fused


def test_fused_sdf_matches_jnp_full_size():
    cfg = SDFConfig()
    params = sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(
        np.random.RandomState(0).randn(700, 4).astype(np.float32) * 0.5)
    ref = np.asarray(sdf_value(cfg, params, pts)[:, 0])
    fused = np.asarray(sdf_value_fused(cfg, params, pts, tile=256,
                                       interpret=True))
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)


def test_fused_sdf_nd_shape():
    cfg = SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), d_out=33)
    params = sdf_init(jax.random.PRNGKey(1), cfg)
    pts = jnp.asarray(
        np.random.RandomState(1).randn(8, 33, 4).astype(np.float32) * 0.3)
    ref = np.asarray(sdf_value(cfg, params, pts)[..., 0])
    fused = np.asarray(sdf_value_fused(cfg, params, pts, tile=128,
                                       interpret=True))
    assert fused.shape == (8, 33)
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)
