"""Console entry points (``pip install .`` -> ``copenerf-train`` etc.).

Thin wrappers over the repo-root scripts' logic so the same commands work
installed or from a checkout (reference usage: ``python train.py <cfg>``,
``/root/reference/README.md:26-49``).
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def train_main(argv=None):
    parser = argparse.ArgumentParser(description="Training")
    parser.add_argument("config_path", type=str, help="Config file path")
    parser.add_argument("--max-epochs", type=int, default=None)
    args = parser.parse_args(argv)

    from .config.loader import load_config
    from .training.trainer import Trainer

    cfg = load_config(args.config_path)
    out_dir = cfg["training"]["out_dir"]
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy(args.config_path, out_dir)
    if cfg["training"].get("backup_source", True):
        from .utils.backup import backup

        backup(out_dir, args.config_path)
    np.random.seed(cfg["training"]["seed"])
    trainer = Trainer(cfg)
    trainer.train(max_epochs=args.max_epochs)
    trainer.save_checkpoint()


def eval_main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluation")
    parser.add_argument("config_path", type=str, help="Config file path")
    parser.add_argument("--no-store", action="store_true")
    args = parser.parse_args(argv)

    from .config.loader import load_config
    from .evaluation.evaluator import Evaluator

    cfg = load_config(args.config_path)
    Evaluator(cfg).eval(store_output=not args.no_store)


def extract_mesh_main(argv=None):
    """Marching-cubes mesh of the learned SDF zero level set -> PLY
    (reference capability: ``NeuSRenderer.extract_geometry`` via mcubes,
    ``/root/reference/model/neus_renderer.py:586-591``; the reference never
    exposes it on the CLI — this makes it first-class)."""
    parser = argparse.ArgumentParser(description="Mesh extraction")
    parser.add_argument("config_path", type=str, help="Config file path")
    parser.add_argument("--out", type=str, default=None,
                        help="Output .ply path (default: out_dir/mesh.ply)")
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--threshold", type=float, default=0.0)
    parser.add_argument("--bound", type=float, default=1.2,
                        help="Half-extent of the symmetric extraction cube")
    parser.add_argument("--time-step", type=float, default=None,
                        help="Query time in [-1, 1] (default: world time)")
    args = parser.parse_args(argv)

    if args.time_step is not None and not -1.0 <= args.time_step <= 1.0:
        parser.error(f"--time-step must be in [-1, 1], got {args.time_step} "
                     "(times are normalized frame indices)")

    from .config.loader import load_config
    from .mesher.marching_cubes import save_ply
    from .training.trainer import Trainer

    cfg = load_config(args.config_path)
    trainer = Trainer(cfg, verbose=False)
    if not trainer.checkpoint_loaded:
        raise SystemExit(
            f"No checkpoint found under {cfg['training']['out_dir']}/models — "
            "refusing to mesh randomly initialized SDF weights. "
            "Train first or point the config's out_dir at a trained run.")
    b = args.bound
    verts, tris = trainer.extract_geometry(
        bound_min=(-b, -b, -b), bound_max=(b, b, b),
        resolution=args.resolution, threshold=args.threshold,
        time_step=args.time_step)
    out = args.out or os.path.join(cfg["training"]["out_dir"], "mesh.ply")
    save_ply(out, verts, tris)
    print(f"wrote {out}: {len(verts)} vertices, {len(tris)} faces")


def bench_main(argv=None):
    import importlib.util
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_path = os.path.join(root, "bench.py")
    spec = importlib.util.spec_from_file_location("copenerf_bench", bench_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["copenerf_bench"] = mod
    spec.loader.exec_module(mod)
    mod.main()
