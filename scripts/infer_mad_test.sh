#!/usr/bin/env bash
# MAD test-split inference (cone/scripts/inference_mad_test.sh equivalent):
# writes submission_mad_best.jsonl; recall tables are meaningless without GT.
set -euo pipefail
WORKDIR=${1:?usage: infer_mad_test.sh WORKDIR TEST_JSONL [RESULTS_DIR]}
TEST_PATH=${2:?path to reformatted MAD test.jsonl}
RESULTS_DIR=${3:-}

python -m cone_tpu.cli infer --workdir "$WORKDIR" --ckpt best \
  --eval_path "$TEST_PATH" \
  ${RESULTS_DIR:+--results_dir "$RESULTS_DIR"} \
  "${@:4}"
