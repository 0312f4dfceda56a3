#!/bin/bash
# Round-5 chip stage 2 (VERDICT r04 next #4): one measured exposure-bias
# cell. docs/REAL_SPEECH.md shows teacher-forced NLL near zero while
# free-running MCD floors at ~32 dB — textbook exposure bias. This cell
# trains the wide-grid dim-128 recipe with an exposure-bias mitigation at
# the 150-epoch budget, so the control is the documented identity row
# "dim 128 + wide grid x9, 150 ep" (MCD 36.2 / F0 13.3 / rho 1.00,
# docs/real_speech_report_dim128_aug_wide.json).
#
# Mechanism (arg 2):
#   ss <p>  — parallel scheduled sampling (TrainConfig.ss_prob: replace
#             inputs with the model's own teacher-forced predictions with
#             prob p; costs one extra forward per step, ~2x step time)
#   in <p>  — input-noise fine-tuning (TrainConfig.input_noise_prob:
#             jitter each quantized input sample by up to
#             input_noise_levels with prob p; zero extra FLOPs)
# Ref: the thesis's own saturation-burst discussion,
# doc/Barbany_report.pdf S4.3.
set -u
cd "$(dirname "$0")/.."
outroot="${1:-real_speech_sweep}"
mech="${2:-ss}"
p="${3:-0.3}"
mkdir -p "$outroot"
WIDE="--augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 --augment_gains 0.79,1.26"

case "$mech" in
  ss) flag="--ss_prob" ;;
  in) flag="--input_noise" ;;
  *) echo "unknown mechanism $mech (ss|in)"; exit 2 ;;
esac

cell="d128_wide_${mech}${p}"
if ! compgen -G "$outroot/$cell/real_speech_report*.json" > /dev/null; then
  echo "=== cell $cell $(date -u +%H:%M:%S) ==="
  timeout 4000 python scripts/real_speech_run.py \
      --out "$outroot/$cell" --dim 128 $WIDE --epochs 150 \
      "$flag" "$p" \
      > "$outroot/$cell.log" 2>&1
  rc=$?
  [ "$rc" -gt 1 ] && echo "CELL FAILED rc=$rc"
  tail -2 "$outroot/$cell.log"
fi
# stage the report next to the other study reports so it survives the
# round even if the (gitignored) sweep dir does not
cp "$outroot/$cell"/real_speech_report*.json docs/ 2>/dev/null
echo "round5 stage2 done $(date -u +%H:%M:%S)"
