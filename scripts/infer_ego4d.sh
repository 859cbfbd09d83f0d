#!/usr/bin/env bash
# Evaluate a trained checkpoint (cone/scripts/inference_ego4d.sh equivalent).
set -euo pipefail
WORKDIR=${1:?usage: infer_ego4d.sh WORKDIR [EVAL_JSONL]}
EVAL_PATH=${2:-}

python -m cone_tpu.cli infer --workdir "$WORKDIR" --ckpt best \
  ${EVAL_PATH:+--eval_path "$EVAL_PATH"}
