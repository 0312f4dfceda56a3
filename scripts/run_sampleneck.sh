#!/bin/bash
# Bottleneck voice-conversion run (ref run_sampleneck.sh): narrowing
# conditioner stack down to --ind_cond_dim.
set -e
python -m msnv_tpu.cli.train \
  --exp bottle-neck \
  --variant bottleneck \
  --ulaw true \
  --frame_sizes 20 4 \
  --seq_len 1040 \
  --n_rnn 2 \
  --look_ahead true \
  --norm_ind false \
  --epoch_limit 500 \
  --learning_rate 1e-4 \
  --batch_size 128 \
  --ind_cond_dim 30 \
  "$@"
