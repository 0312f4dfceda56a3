#!/bin/bash
# Round-3 follow-up cells after the wide-grid result (MCD 36.2 at dim
# 128): does the x9 grid compose with capacity (dim 256) and with the
# long schedule?
set -u
cd "$(dirname "$0")/.."
outroot="${1:-real_speech_sweep}"
mkdir -p "$outroot"

run_cell() {
  local name="$1"; shift
  echo "=== cell $name $(date -u +%H:%M:%S) ==="
  timeout 9000 python scripts/real_speech_run.py \
      --out "$outroot/$name" "$@" > "$outroot/$name.log" 2>&1
  rc=$?
  [ "$rc" -gt 1 ] && echo "CELL FAILED rc=$rc: $name"
  tail -2 "$outroot/$name.log"
}

run_cell d256_aug_wide --dim 256 \
    --augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 \
    --augment_gains 0.79,1.26 --epochs 150
run_cell d128_wide_ep450 --dim 128 \
    --augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 \
    --augment_gains 0.79,1.26 --epochs 450
echo "sweep r3b done $(date -u +%H:%M:%S)"
