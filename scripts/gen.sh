#!/bin/bash
# Interactive checkpoint picker + generation (ref gen.sh capability).
set -e
cd "$(dirname "$0")/.."
RESULTS=${RESULTS_PATH:-results}
mapfile -t CKPTS < <(find "$RESULTS" -path '*/checkpoints/*.npz' | sort)
if [ ${#CKPTS[@]} -eq 0 ]; then echo "no checkpoints under $RESULTS"; exit 1; fi
echo "checkpoints:"
select CKPT in "${CKPTS[@]}"; do break; done
python -m msnv_tpu.cli.generate --model "$CKPT" "$@"
