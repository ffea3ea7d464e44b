#!/usr/bin/env python
"""Derive short-schedule parity-gate configs from the reference scene YAMLs.

Used by scripts/parity_gates.sh: takes a reference config
(e.g. /root/reference/configs/Co3D/skateboard.yaml), points it at the
mounted data root, rescales the schedule, and writes two YAMLs — one for
the reference repo, one for ours (identical contents; both loaders apply
the same two-layer merge against their default.yaml, which are
key-identical, PARITY.md).
"""

import argparse
import copy
import os
import sys

import yaml


def load_yaml(path, required=True):
    if not required and not os.path.isfile(path):
        print(f"warning: {path} not found; scaling only keys present in "
              "the scene yaml", file=sys.stderr)
        return {}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_cfg", help="reference scene yaml")
    ap.add_argument("data_root", help="mounted dataset root")
    ap.add_argument("out_cfg", help="derived yaml to write")
    ap.add_argument("out_dir", help="training out_dir to set")
    ap.add_argument("--schedule-scale", type=float, default=0.02,
                    help="fraction of the full schedule to run "
                         "(epochs, stage-2 start, warmup, drops; "
                         "1.0 = the full published schedule)")
    ap.add_argument("--eval-pose-scale", type=float, default=None,
                    help="separate scale for eval_pose_epoch "
                         "(default: same as --schedule-scale)")
    args = ap.parse_args()

    cfg = load_yaml(args.ref_cfg)
    tr = cfg.setdefault("training", {})
    dl = cfg.setdefault("dataloading", {})

    # Point at the mounted data; keep the scene name from the config.
    dl["path"] = args.data_root
    tr["out_dir"] = args.out_dir

    s = args.schedule_scale
    if s != 1.0:
        default_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(args.ref_cfg))),
            "default.yaml")
        defaults = load_yaml(default_path, required=False)
        dtr = defaults.get("training", {})

        def get(key):
            return tr.get(key, dtr.get(key))

        def scale_int(key, lo=1):
            v = get(key)
            if v is not None:
                tr[key] = max(int(v * s), lo)

        scale_int("scheduling_start")
        scale_int("scheduling_epoch", lo=2)
        scale_int("start_query_world_epoch")
        scale_int("nb_warm_up_it", lo=10)
        scale_int("end_sdf_weight_increase_iteration", lo=10)
        scale_int("end_consistency_weight_increase_iteration", lo=10)
        scale_int("end_smooth_epoch")
        scale_int("pose_refine_epochs", lo=40)
        drops = get("lr_drop_half_epoch") or []
        tr["lr_drop_half_epoch"] = [max(int(e * s), 1) for e in drops]
        c2f = get("coarse_to_fine_scheduler") or {}
        if c2f:
            tr["coarse_to_fine_scheduler"] = {
                scale: [int(lo * s), max(int(hi * s), int(lo * s) + 1)
                        if hi < 10 ** 9 else hi]
                for scale, (lo, hi) in c2f.items()}
        anneal = get("neus_anneal_end")
        if anneal:
            cfg.setdefault("neus_training", {})["neus_anneal_end"] = max(
                int(anneal * s), 10)
        ev = cfg.setdefault("eval", {})
        es = args.eval_pose_scale if args.eval_pose_scale is not None else s
        base_eval = ev.get("eval_pose_epoch", 300)
        ev["eval_pose_epoch"] = max(int(base_eval * es), 10)
        # Keep stage-2 start strictly inside the window. Both keys exist
        # after scale_int for any config derived from the reference's
        # two-layer scheme; a standalone yaml missing them (and with no
        # sibling default.yaml) gets a clear error, not a KeyError.
        if get("scheduling_start") is None or get("scheduling_epoch") is None:
            sys.exit(f"error: scheduling_start/scheduling_epoch missing "
                     f"from {args.ref_cfg} and {default_path}; cannot "
                     "rescale the schedule (pass --schedule-scale 1.0 or "
                     "add the keys)")
        end = tr["scheduling_start"] + tr["scheduling_epoch"]
        if tr.get("start_query_world_epoch", 0) >= end:
            tr["start_query_world_epoch"] = max(end - 2, 1)

    with open(args.out_cfg, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    print(args.out_cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
