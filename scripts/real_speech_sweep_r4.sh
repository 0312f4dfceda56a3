#!/bin/bash
# Round-4 quality-frontier cells (VERDICT r03 item 5): the GAN and
# bottleneck heads at the best known real-speech recipe (dim 128 +
# wide x9 perturbation grid), so disentanglement cost is measured at the
# quality frontier instead of the weak x3/150-epoch operating point, and
# the bottleneck variant gets its first real-speech row (with the same
# post-hoc speaker-probe score the GAN rows carry).
#
# - bottleneck at the full 450-epoch frontier schedule (its step cost is
#   ~identity, so the long schedule is affordable: ~35 min)
# - GAN + lambda-0 control at 150 epochs on the wide grid (~65 min each;
#   the GAN step is ~5x identity, so 450 epochs would be ~3 h/cell —
#   450-epoch GAN is queued separately if chip budget allows).
#   lambda ramp 0 -> 0.01 over 15k of ~155k steps (~10% of the run, the
#   same fraction as the round-3 x3-grid recipe's 5k/51.6k).
#
# Sequential on the one chip. Usage: bash scripts/real_speech_sweep_r4.sh [outroot]
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

WIDE="--augment_speeds 0.85,0.9,0.95,1.05,1.1,1.15 --augment_gains 0.79,1.26"

run_cell d128_wide_ep450_neck --dim 128 $WIDE --epochs 450 \
    --variant bottleneck --ind_cond_dim 30
run_cell d128_wide_gan  --dim 128 $WIDE --epochs 150 \
    --variant gan --lambda_weight 0 0.01 15000
run_cell d128_wide_gan0 --dim 128 $WIDE --epochs 150 \
    --variant gan --lambda_weight 0 0 1
echo "sweep r4 done $(date -u +%H:%M:%S)"
