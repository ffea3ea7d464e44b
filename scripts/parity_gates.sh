#!/usr/bin/env bash
# Real-dataset parity gates (BASELINE.md "Measurement plan" steps 2-3).
#
# Runs BOTH implementations — the PyTorch reference (needs CUDA) and
# copenerf_tpu — through train + eval on the same mounted scenes with an
# identically rescaled short schedule, then prints side-by-side
# results.txt diffs. Unrunnable in the build environment (no datasets, no
# GPU); where data exists this reduces the blocked validation to ONE
# command:
#
#   scripts/parity_gates.sh <data_root> [out_root] [schedule_scale]
#
# <data_root> must contain the nope-nerf-preprocessed datasets the
# reference README points at (README.md:22):
#   <data_root>/Co3D/skateboard/...      (configs/Co3D/skateboard.yaml)
#   <data_root>/Tanks/Ballroom/...       (configs/Tanks/Ballroom.yaml)
#   <data_root>/Scannet/scene0079_00/... (configs/Scannet/scene0079.yaml,
#                                         exercises GT-depth eval)
# Edit SCENES below to match the scenes you mounted.
#
# Implementation selection:
#   RUN_REFERENCE=0  skip the reference runs (no CUDA host)
#   RUN_OURS=0       skip ours
# Scale: schedule_scale=1.0 runs the full published schedule; the default
# 0.02 gives a ~2% smoke schedule for a same-day comparison.
set -euo pipefail

DATA_ROOT=${1:?usage: parity_gates.sh <data_root> [out_root] [scale]}
OUT_ROOT=${2:-out/parity_gates}
SCALE=${3:-0.02}
# Absolutize both roots: the train/eval invocations below cd into the
# reference checkout (and into $REPO), so every path baked into the gate
# configs — and the cfg paths themselves — must survive a cwd change.
DATA_ROOT=$(cd "$DATA_ROOT" && pwd)
mkdir -p "$OUT_ROOT"
OUT_ROOT=$(cd "$OUT_ROOT" && pwd)
REPO=$(cd "$(dirname "$0")/.." && pwd)
REFERENCE=${REFERENCE_ROOT:-/root/reference}
RUN_REFERENCE=${RUN_REFERENCE:-1}
RUN_OURS=${RUN_OURS:-1}

# dataset-subdir:reference-config (edit to the scenes you mounted)
SCENES=(
  "Co3D:${REFERENCE}/configs/Co3D/skateboard.yaml"
  "Tanks:${REFERENCE}/configs/Tanks/Ballroom.yaml"
  "Scannet:${REFERENCE}/configs/Scannet/scene0079.yaml"
)

mkdir -p "$OUT_ROOT"
summary="$OUT_ROOT/SUMMARY.md"
echo "# Parity gates ($(date -u +%F)) — schedule_scale=$SCALE" > "$summary"

for entry in "${SCENES[@]}"; do
  subset="${entry%%:*}"; ref_cfg="${entry#*:}"
  name=$(basename "$ref_cfg" .yaml)
  scene_out="$OUT_ROOT/$name"
  mkdir -p "$scene_out"
  if [ ! -f "$ref_cfg" ]; then
    echo "skip $name: $ref_cfg not found" | tee -a "$summary"; continue
  fi
  if [ ! -d "$DATA_ROOT/$subset" ]; then
    echo "skip $name: $DATA_ROOT/$subset not mounted" | tee -a "$summary"
    continue
  fi

  for side in reference ours; do
    [ "$side" = reference ] && [ "$RUN_REFERENCE" != 1 ] && continue
    [ "$side" = ours ] && [ "$RUN_OURS" != 1 ] && continue
    out_dir="$scene_out/$side"
    cfg="$scene_out/${side}.yaml"
    python "$REPO/scripts/make_gate_cfg.py" "$ref_cfg" "$DATA_ROOT/$subset" \
      "$cfg" "$out_dir" --schedule-scale "$SCALE"
    echo "=== [$name/$side] train + eval ==="
    if [ "$side" = reference ]; then
      ( cd "$REFERENCE" && python train.py "$cfg" && python eval.py "$cfg" )
    else
      ( cd "$REPO" && python train.py "$cfg" && python eval.py "$cfg" )
    fi
  done

  # Side-by-side metric diff (PSNR/SSIM/LPIPS/ATE/RPE/depth rows).
  {
    echo; echo "## $name"; echo
    echo '| metric | reference | ours |'
    echo '|---|---|---|'
    python - "$scene_out/reference/results.txt" \
             "$scene_out/ours/results.txt" <<'PY'
import sys, os
def load(p):
    if not os.path.isfile(p): return {}
    return dict(l.strip().split(': ', 1) for l in open(p) if ': ' in l)
ref, ours = load(sys.argv[1]), load(sys.argv[2])
for k in sorted(set(ref) | set(ours)):
    print(f"| {k} | {ref.get(k, '-')} | {ours.get(k, '-')} |")
PY
  } >> "$summary"
done

echo; echo "==== $summary ===="; cat "$summary"
