"""Worker for the REAL multi-process DCN test (test_multiprocess.py).

Each of N processes owns 4 virtual CPU devices; ``jax.distributed`` wires
them into one 4N-device global mesh through the same
``copenerf_tpu.parallel.distributed`` entry points the trainer uses.
Runnable standalone (two terminals):

    python tests/_dist_worker.py --coordinator localhost:9876 \
        --num-processes 2 --process-id 0 --out /tmp/p0.json
    python tests/_dist_worker.py --coordinator localhost:9876 \
        --num-processes 2 --process-id 1 --out /tmp/p1.json
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(tests_dir)
    for p in (repo, tests_dir):
        if p not in sys.path:
            sys.path.insert(0, p)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from copenerf_tpu.parallel import distributed as dist

    # THE code under test: multi-process initialize -> global mesh ->
    # replicate/shard helpers -> one sharded train step.
    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_processes,
                    process_id=args.process_id)
    # Bring-up sentinel: the test distinguishes "jax.distributed never came
    # up in this environment" (skip) from "hang AFTER successful bring-up"
    # (a real distributed regression -> fail).
    with open(args.out + ".bringup", "w") as f:
        f.write("ok")
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert dist.is_primary() == (args.process_id == 0)

    import numpy as np
    import jax.numpy as jnp

    import test_train_step as T
    from copenerf_tpu.models import init_all_fields
    from copenerf_tpu.training.step import build_train_step, init_train_state

    mesh = dist.global_mesh()
    n_global = args.num_processes * 4
    assert mesh.size == n_global, mesh.size

    params = init_all_fields(jax.random.PRNGKey(0), T.FIELD_CFGS)
    state = init_train_state(params)
    step = build_train_step(T.FIELD_CFGS, T.RCFG, T._static(stage1=True),
                            mesh=mesh)
    batch = T._batch(jax.random.PRNGKey(1))
    gbatch = dist.replicate_to_global(mesh, batch)
    state, metrics = step(state, gbatch, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])           # replicated -> addressable

    # shard_to_global: each process contributes its local half of the rays.
    local = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    local = local + 1000.0 * args.process_id
    grays = dist.shard_to_global(mesh, local)
    assert grays.shape == (8 * args.num_processes, 3)
    gsum = float(jax.jit(jnp.sum)(grays))   # cross-host reduction

    # A param leaf after the update, to check bitwise agreement across
    # processes (replicated params must stay replicated).
    leaf = np.asarray(
        jax.tree_util.tree_leaves(state["params"]["sdf"])[0]).ravel()[:8]

    with open(args.out, "w") as f:
        json.dump({"loss": loss, "gsum": gsum,
                   "leaf": leaf.tolist(),
                   "process_count": jax.process_count()}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
