#!/bin/bash
# Canonical multi-speaker run (ref run_samplernn.sh): mu-law, 2-tier (20,4),
# 2-layer dim-1024 GRUs, look-ahead conditioning, joint normalization.
set -e
python -m msnv_tpu.cli.train \
  --exp samplernn \
  --ulaw true \
  --frame_sizes 20 4 \
  --seq_len 1040 \
  --n_rnn 2 \
  --look_ahead true \
  --norm_ind false \
  --epoch_limit 500 \
  --learning_rate 1e-4 \
  --weight_norm false \
  --scheduler false \
  --batch_size 128 \
  "$@"
