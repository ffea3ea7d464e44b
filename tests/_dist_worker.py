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
    ap.add_argument("--mode", choices=("step", "trainer"), default="step")
    ap.add_argument("--scene-path")
    ap.add_argument("--scene-name")
    ap.add_argument("--out-dir")
    ap.add_argument("--max-epochs", type=int, default=2)
    ap.add_argument("--expect-resume-epoch", type=int, default=-1)
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

    if args.mode == "trainer":
        return trainer_mode(args, dist)

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


def trainer_mode(args, dist):
    """REAL multi-epoch Trainer endurance under jax.distributed: train N
    epochs of the sharded step, primary-gated checkpointing
    (trainer.py:742-748), resume across a process restart, and the
    process-local render mesh (trainer.py:190-194)."""
    import json

    import numpy as np
    import jax

    from test_trainer_e2e import _tiny_cfg
    from copenerf_tpu.training.trainer import Trainer

    cfg = _tiny_cfg(args.scene_path, args.scene_name, args.out_dir)
    cfg["training"].update({
        "distributed": True,
        "checkpoint_every": 1,
        "scheduling_start": 2,
        "scheduling_epoch": 4,
        "start_query_world_epoch": 10 ** 6,   # stage 1 only
        "eval_pose_every": 10 ** 6,
        "print_every": 10 ** 6,
    })
    trainer = Trainer(cfg, verbose=(args.process_id == 0))
    assert trainer.mesh is not None and trainer.mesh.size == 8, trainer.mesh
    if args.expect_resume_epoch >= 0:
        assert trainer.checkpoint_loaded, "resume run found no checkpoint"
        assert trainer.epoch_it + 1 == args.expect_resume_epoch, \
            trainer.epoch_it
    trainer.train(max_epochs=args.max_epochs)
    trainer.save_checkpoint()   # primary-gated inside

    # Process-LOCAL render mesh: under multi-process training the image
    # renderer must run on local devices only (each process renders
    # independently).
    res = trainer.image_renderer.render_image(
        trainer.state["params"], trainer.train_field.K[0],
        np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32),
        trainer.time_of(0), (12, 16), trainer.depth_range, 1.0)
    render_mean = float(np.mean(res["color"]))
    assert np.isfinite(render_mean)

    leaves = jax.tree_util.tree_leaves(trainer.state["params"])
    flat = np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in leaves])
    with open(args.out, "w") as f:
        json.dump({
            "mode": "trainer",
            "process_count": jax.process_count(),
            "is_primary": dist.is_primary(),
            "it": trainer.it,
            "epoch_it": trainer.epoch_it,
            "param_norm": float(np.linalg.norm(flat)),
            "param_head": flat[:16].tolist(),
            "render_mean": render_mean,
            "ckpt_exists": __import__("os").path.isfile(
                __import__("os").path.join(args.out_dir, "models", "weights",
                                           "model.ckpt.npz")),
        }, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
