#!/usr/bin/env bash
# Evaluate a trained MAD checkpoint on the val split
# (cone/scripts/inference_mad.sh equivalent).
set -euo pipefail
WORKDIR=${1:?usage: infer_mad.sh WORKDIR [EVAL_JSONL]}
EVAL_PATH=${2:-}

python -m cone_tpu.cli infer --workdir "$WORKDIR" --ckpt best \
  ${EVAL_PATH:+--eval_path "$EVAL_PATH"}
