#!/usr/bin/env python
"""Eval CLI: ``python eval.py configs/Co3D/skateboard.yaml``.

Equivalent of the reference entry point (``/root/reference/eval.py:289-298``):
test-time pose optimization, novel-view rendering, NVS/depth/pose metrics,
results.txt + extraction dumps.
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Evaluation")
    parser.add_argument("config_path", type=str, help="Config file path")
    parser.add_argument("--no-store", action="store_true",
                        help="Skip writing extraction artifacts")
    args = parser.parse_args()

    from copenerf_tpu.config.loader import load_config
    from copenerf_tpu.evaluation.evaluator import Evaluator

    cfg = load_config(args.config_path)
    evaluator = Evaluator(cfg)
    evaluator.eval(store_output=not args.no_store)


if __name__ == "__main__":
    main()
