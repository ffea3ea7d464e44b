"""Per-camera learnable pose correction on top of frozen init poses.

Mirrors ``/root/reference/model/poses_retriever.py:6-32``: pose(i) =
``SE3(exp(r_i), t_i) @ init_c2w_i`` with learnable axis-angle ``r`` and
translation ``t``. As a pytree: ``{"r": (N, 3), "t": (N, 3)}``; ``init_c2w``
is carried separately (frozen, not optimized).
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import make_c2w


def pose_retriever_init(num_cams: int, init_c2w=None) -> tuple:
    params = {
        "r": jnp.zeros((num_cams, 3), jnp.float32),
        "t": jnp.zeros((num_cams, 3), jnp.float32),
    }
    if init_c2w is None:
        init_c2w = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                    (num_cams, 4, 4))
    return params, jnp.asarray(init_c2w, jnp.float32)


def pose_retriever_apply(params: dict, init_c2w: jnp.ndarray, cam_id):
    """Pose for one camera id (traced or static)."""
    corr = make_c2w(params["r"][cam_id], params["t"][cam_id])
    return corr @ init_c2w[cam_id]


def pose_retriever_all(params: dict, init_c2w: jnp.ndarray) -> jnp.ndarray:
    """All (N, 4, 4) poses in one batched op."""
    corr = make_c2w(params["r"], params["t"])
    return corr @ init_c2w
