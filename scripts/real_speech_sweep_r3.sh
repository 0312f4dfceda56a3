#!/bin/bash
# Round-3 real-speech quality matrix (VERDICT r02 item 4): the missing
# best-fidelity cell (dim 256 + augmentation), a wider perturbation grid
# (speeds 0.85-1.15 + gains), the long schedule on the winning config,
# and the GAN head on the augmented corpus with a post-hoc speaker-probe
# disentanglement score (plus its lambda-0 control).
#
# Sequential on the one chip; each cell writes real_speech_report*.json
# under its own --out dir. Usage: bash scripts/real_speech_sweep_r3.sh [outroot]
set -u
cd "$(dirname "$0")/.."
outroot="${1:-real_speech_sweep}"
mkdir -p "$outroot"

run_cell() {
  local name="$1"; shift
  echo "=== cell $name $(date -u +%H:%M:%S) ==="
  timeout 7200 python scripts/real_speech_run.py \
      --out "$outroot/$name" "$@" > "$outroot/$name.log" 2>&1
  rc=$?
  # rc 1 is the CHECK gate (f0 rank < 0.8) — report still written;
  # anything else is a real failure worth flagging loudly
  [ "$rc" -gt 1 ] && echo "CELL FAILED rc=$rc: $name"
  tail -2 "$outroot/$name.log"
}

run_cell d256_aug      --dim 256 --augment_speeds 0.9,1.1 --epochs 150
run_cell d128_aug_wide --dim 128 \
    --augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 \
    --augment_gains 0.79,1.26 --epochs 150
run_cell d128_aug_ep450 --dim 128 --augment_speeds 0.9,1.1 --epochs 450
run_cell d128_aug_gan  --dim 128 --augment_speeds 0.9,1.1 --epochs 150 \
    --variant gan --lambda_weight 0 0.01 5000
run_cell d128_aug_gan0 --dim 128 --augment_speeds 0.9,1.1 --epochs 150 \
    --variant gan --lambda_weight 0 0 1
echo "sweep r3 done $(date -u +%H:%M:%S)"
