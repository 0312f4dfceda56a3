#!/bin/bash
# Round-4 chip pipeline: the quality-frontier cells (VERDICT r03 item 5),
# then the voice-conversion matrices on each trained cell (item 1).
# Sequential on the one chip; each stage logs under $outroot and keeps its
# checkpoints so scripts/voice_conversion_run.py can consume them.
#
# Usage: bash scripts/round4_chip_pipeline.sh [outroot]
set -u
cd "$(dirname "$0")/.."
outroot="${1:-real_speech_sweep}"
mkdir -p "$outroot"

run_cell() {
  local name="$1"; shift
  if compgen -G "$outroot/$name/real_speech_report*.json" > /dev/null; then
    echo "=== cell $name already has a report, skipping ==="
    return 0
  fi
  echo "=== cell $name $(date -u +%H:%M:%S) ==="
  timeout 9000 python scripts/real_speech_run.py \
      --out "$outroot/$name" "$@" > "$outroot/$name.log" 2>&1
  rc=$?
  [ "$rc" -gt 1 ] && echo "CELL FAILED rc=$rc: $name"
  tail -2 "$outroot/$name.log"
}

run_vc() {
  local cell="$1" label="$2"
  echo "=== vc $label $(date -u +%H:%M:%S) ==="
  timeout 4000 python scripts/voice_conversion_run.py \
      --cell "$outroot/$cell" --label "$label" \
      > "$outroot/vc_$label.log" 2>&1
  rc=$?
  [ "$rc" -ne 0 ] && echo "VC FAILED rc=$rc: $label"
  tail -3 "$outroot/vc_$label.log"
}

WIDE="--augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 --augment_gains 0.79,1.26"

# identity frontier cell first: it is both the VC identity path and the
# fastest cell, so conversion results exist early in the round
run_cell d128_wide_ep450 --dim 128 $WIDE --epochs 450
run_vc d128_wide_ep450 identity

run_cell d128_wide_ep450_neck --dim 128 $WIDE --epochs 450 \
    --variant bottleneck --ind_cond_dim 30
run_vc d128_wide_ep450_neck bottleneck

run_cell d128_wide_gan  --dim 128 $WIDE --epochs 150 \
    --variant gan --lambda_weight 0 0.01 15000
run_vc d128_wide_gan gan

run_cell d128_wide_gan0 --dim 128 $WIDE --epochs 150 \
    --variant gan --lambda_weight 0 0 1

echo "round4 chip pipeline done $(date -u +%H:%M:%S)"
