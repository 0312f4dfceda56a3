#!/bin/bash
# Adversarial speaker-disentanglement run (ref run_samplegan.sh):
# ConditionerCNN + discriminator, lambda ramp 0 -> 0.01 over 50k steps.
set -e
python -m msnv_tpu.cli.train \
  --exp samplernn-gan \
  --variant gan \
  --ulaw true \
  --frame_sizes 20 4 \
  --seq_len 1040 \
  --n_rnn 2 \
  --look_ahead true \
  --norm_ind false \
  --epoch_limit 500 \
  --learning_rate 1e-4 \
  --weight_norm true \
  --scheduler true \
  --batch_size 64 \
  --lambda_weight 0 0.01 50000 \
  --ind_cond_dim 50 \
  "$@"
