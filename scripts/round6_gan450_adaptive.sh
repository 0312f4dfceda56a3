#!/bin/bash
# Queued chip stage (round 5 follow-up): the adaptive-lambda GAN head at
# the 450-epoch frontier budget. The fixed-lambda frontier cell measured
# (docs/VOICE_CONVERSION.md "round 5"): fidelity closes (33.0 dB) but
# conversion decays (0.83/0.93 -> 0.60/0.67) because the in-loop disc NLL
# collapses to ~0 and the reversal gradient saturates. This cell holds the
# disc NLL near ln(6)/2 = 0.896 nats (6 speakers on the wide grid) with
# the stateless controller (training/gan.py lambda_adaptive) and re-runs
# the conversion matrix — answers whether controlled pressure preserves
# the 150-epoch conversion headline AT the converged fidelity.
# Budget: same 5 h cell / 100 min VC envelope as round5_gan450.sh.
set -u
cd "$(dirname "$0")/.."
outroot="${1:-real_speech_sweep}"
mkdir -p "$outroot"
WIDE="--augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 --augment_gains 0.79,1.26"

if ! compgen -G "$outroot/d128_wide_gan_ad_ep450/real_speech_report*.json" > /dev/null; then
  echo "=== cell d128_wide_gan_ad_ep450 $(date -u +%H:%M:%S) ==="
  timeout 18000 python scripts/real_speech_run.py \
      --out "$outroot/d128_wide_gan_ad_ep450" --dim 128 $WIDE --epochs 450 \
      --variant gan --lambda_weight 0 0.01 45000 \
      --lambda_adaptive 0.896 2.0 100 \
      > "$outroot/d128_wide_gan_ad_ep450.log" 2>&1
  rc=$?
  [ "$rc" -gt 1 ] && echo "CELL FAILED rc=$rc"
  tail -2 "$outroot/d128_wide_gan_ad_ep450.log"
fi

echo "=== vc gan_ad_ep450 $(date -u +%H:%M:%S) ==="
timeout 6000 python scripts/voice_conversion_run.py \
    --cell "$outroot/d128_wide_gan_ad_ep450" --label gan_ad_ep450 \
    > "$outroot/vc_gan_ad_ep450.log" 2>&1
rc=$?
[ "$rc" -ne 0 ] && echo "VC FAILED rc=$rc"
tail -3 "$outroot/vc_gan_ad_ep450.log"
echo "adaptive-lambda stage done $(date -u +%H:%M:%S)"
