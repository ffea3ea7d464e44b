"""Multi-host execution over DCN.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(``/root/reference/train.py:54``). Here the same 1-D ``('data',)``
ray-sharding mesh simply extends across hosts: ``jax.distributed``
wires the processes together, the mesh spans all *global* devices
(ICI within a slice, DCN across slices/hosts), and GSPMD keeps the
gradient all-reduce hierarchical (reduce within a slice first, then
across DCN). No framework code changes between 1 chip and a pod —
only the mesh gets bigger.

Usage (same program on every host)::

    from copenerf_tpu.parallel import distributed as dist
    dist.initialize()                     # no-op single-process
    mesh = dist.global_mesh()
    batch = dist.replicate_to_global(mesh, batch)   # pytree -> global arrays
    step = build_train_step(field_cfgs, rcfg, static, mesh=mesh)

Checkpointing/logging should be gated on ``dist.is_primary()``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, make_mesh

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent ``jax.distributed.initialize``.

    With no arguments, auto-detects from the TPU environment (the standard
    JAX behavior on Cloud TPU); a single-process run (no coordinator, no TPU
    pod metadata) is a silent no-op so the same entry point works everywhere.
    """
    global _initialized
    if _initialized:
        return
    # NOTE: do NOT touch jax.process_count()/jax.devices() here — querying
    # them initializes the runtime and makes jax.distributed.initialize
    # impossible ("must be called before any JAX computations").
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _initialized = True
    except Exception:
        # Single-process / non-pod environment (no coordinator detectable),
        # or the runtime was already up (e.g. initialize() called twice, or
        # a prior device query in a single-process run): nothing to wire up.
        # A real multi-process request that failed must not be swallowed.
        if num_processes not in (None, 1) and jax.process_count() == 1:
            raise
        _initialized = True


def barrier(name: str = "copenerf-barrier") -> None:
    """Fail-fast collective barrier over all processes (no-op single-process).

    Run once right after :func:`initialize`, before any heavy compile. Two
    jobs: (1) verify the collective fabric end-to-end before hours of
    training are queued behind it; (2) establish the CPU Gloo communicator
    for the all-device clique while inter-process skew is still seconds.
    Gloo exchanges peer addresses under a fixed 30 s KV-store deadline
    (``GetKeyValue() timed out``), and the FIRST collective otherwise races
    that deadline against the per-process compile of the big train step —
    observed as a DEADLINE_EXCEEDED mid-epoch in the 2-process endurance
    test under CPU contention. The communicator is cached per device
    clique, so the train step's gradient all-reduce (same global device
    set) reuses it.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    """True on the process that should log / write checkpoints."""
    return jax.process_index() == 0


def global_mesh(n_devices: int | None = None):
    """1-D ('data',) mesh over ALL global devices (every process's chips)."""
    return make_mesh(n_devices, devices=jax.devices())


def replicate_to_global(mesh, tree):
    """Pytree of host arrays -> fully-replicated global ``jax.Array``s.

    Every process must pass identical values (the trainer's batch dict —
    image stack, intrinsics, scalars — is deterministic given the config,
    so this holds by construction). Under a single process this is just a
    device_put with a replicated sharding.
    """
    sharding = NamedSharding(mesh, P())

    def _rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(_rep, tree)


def shard_to_global(mesh, tree):
    """Pytree of per-process arrays (leading axis = local rays) -> global
    arrays sharded along the leading axis of the global mesh.

    Each process contributes its local shard; the global shape is
    ``process_count * local`` along axis 0. Used when rays are generated
    host-side (evaluation rendering); the train step generates rays
    on-device and only needs :func:`replicate_to_global`.
    """
    def _shard(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(_shard, tree)
