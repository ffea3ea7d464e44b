#!/usr/bin/env python
"""Train CLI: ``python train.py configs/Co3D/skateboard.yaml``.

Drop-in equivalent of the reference entry point
(``/root/reference/train.py:562-579``): merges the scene config over the
defaults, backs it up into out_dir, seeds, and runs the two-stage trainer.
"""

import argparse
import os
import shutil

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Training")
    parser.add_argument("config_path", type=str, help="Config file path")
    parser.add_argument("--max-epochs", type=int, default=None,
                        help="Optional cap on epochs this invocation")
    args = parser.parse_args()

    from copenerf_tpu.config.loader import load_config

    cfg = load_config(args.config_path)
    out_dir = cfg["training"]["out_dir"]
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy(args.config_path, out_dir)
    if cfg["training"].get("backup_source", True):
        from copenerf_tpu.utils.backup import backup

        backup(out_dir, args.config_path)

    np.random.seed(cfg["training"]["seed"])

    from copenerf_tpu.training.trainer import Trainer

    trainer = Trainer(cfg)
    trainer.train(max_epochs=args.max_epochs)
    trainer.save_checkpoint()


if __name__ == "__main__":
    main()
