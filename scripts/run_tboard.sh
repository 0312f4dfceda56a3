#!/bin/bash
# Serve TensorBoard over the training event logs (ref run_tboard.sh).
LOGDIR=${1:-sample_board}
exec tensorboard --logdir "$LOGDIR" --bind_all
