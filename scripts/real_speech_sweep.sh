#!/bin/bash
# Real-speech capacity sweep (VERDICT r1 item 5): the remaining cells of
# dim x norm_ind x schedule around the two already-recorded runs
# (dim1024/ind and dim256/ind, 150 epochs — docs/REAL_SPEECH.md).
# Sequential on the one chip; each cell trains the canonical config on
# the 127 s staged corpus via scripts/real_speech_run.py and writes
# real_speech_report<suffix>.json under its own --out dir.
#
# Usage: bash scripts/real_speech_sweep.sh [outroot]
set -u
cd "$(dirname "$0")/.."
outroot="${1:-real_speech_sweep}"
mkdir -p "$outroot"
for cell in "128 true 150" "512 true 150" "256 false 150" "256 true 450"; do
  set -- $cell
  dim="$1" ni="$2" ep="$3"
  echo "=== cell dim=$dim norm_ind=$ni epochs=$ep $(date -u +%H:%M:%S) ==="
  timeout 5400 python scripts/real_speech_run.py \
      --dim "$dim" --norm_ind "$ni" --epochs "$ep" \
      --out "$outroot/d${dim}_n${ni}_ep${ep}" \
      > "$outroot/d${dim}_n${ni}_ep${ep}.log" 2>&1
  rc=$?
  # rc 1 just means the CHECK gate (f0 rank < 0.8) — the report is still
  # written; anything else is a real failure worth flagging loudly
  [ "$rc" -gt 1 ] && echo "CELL FAILED rc=$rc: $cell"
  tail -2 "$outroot/d${dim}_n${ni}_ep${ep}.log"
done
echo "sweep done $(date -u +%H:%M:%S)"
