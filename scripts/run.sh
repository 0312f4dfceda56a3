#!/bin/bash
# Experiment dispatcher (ref run.sh:1-12): maps an experiment name to its
# canonical run script. Variants are config flags here, not git branches.
set -e
cd "$(dirname "$0")/.."
case "$1" in
  samplernn)     exec scripts/run_samplernn.sh "${@:2}" ;;
  samplernn-gan) exec scripts/run_samplegan.sh "${@:2}" ;;
  bottle-neck)   exec scripts/run_sampleneck.sh "${@:2}" ;;
  *) echo "usage: $0 {samplernn|samplernn-gan|bottle-neck} [extra flags]"; exit 1 ;;
esac
