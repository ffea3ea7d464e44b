"""Device mesh + sharding helpers.

Parallelism model (replacing the reference's single-host
``torch.nn.DataParallel``, ``/root/reference/train.py:54``): rays shard over
a 1-D ``('data',)`` mesh; field/motion params replicate; XLA/GSPMD inserts
the gradient all-reduce over ICI. Multi-host extends the same mesh over all
processes (``jax.distributed`` initialization is the caller's concern).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def ray_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """First axis (rays) sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh | None, x):
    """Sharding constraint along the leading ray axis (no-op without mesh)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, ray_sharding(mesh, x.ndim))
