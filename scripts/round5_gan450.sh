#!/bin/bash
# Round-5 chip stage 1 (VERDICT r04 next #3): the GAN head at the SAME
# 450-epoch budget as the identity/bottleneck frontier cells, then its
# conversion matrix — answers whether the 150-epoch conversion headline
# (F0->tgt 0.83 / spec->tgt 0.93) survives convergence and whether
# copy-synth quality closes toward the 32.5-34.2 dB frontier.
# Lambda ramp scaled to the same ~10%-of-run fraction as the 150-epoch
# recipe (15k/155k steps -> 45k/465k).
set -u
cd "$(dirname "$0")/.."
outroot="${1:-real_speech_sweep}"
mkdir -p "$outroot"
WIDE="--augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 --augment_gains 0.79,1.26"

if ! compgen -G "$outroot/d128_wide_gan_ep450/real_speech_report*.json" > /dev/null; then
  echo "=== cell d128_wide_gan_ep450 $(date -u +%H:%M:%S) ==="
  timeout 18000 python scripts/real_speech_run.py \
      --out "$outroot/d128_wide_gan_ep450" --dim 128 $WIDE --epochs 450 \
      --variant gan --lambda_weight 0 0.01 45000 \
      > "$outroot/d128_wide_gan_ep450.log" 2>&1
  rc=$?
  [ "$rc" -gt 1 ] && echo "CELL FAILED rc=$rc"
  tail -2 "$outroot/d128_wide_gan_ep450.log"
fi

echo "=== vc gan_ep450 $(date -u +%H:%M:%S) ==="
timeout 6000 python scripts/voice_conversion_run.py \
    --cell "$outroot/d128_wide_gan_ep450" --label gan_ep450 \
    > "$outroot/vc_gan_ep450.log" 2>&1
rc=$?
[ "$rc" -ne 0 ] && echo "VC FAILED rc=$rc"
tail -3 "$outroot/vc_gan_ep450.log"
echo "round5 stage1 done $(date -u +%H:%M:%S)"
