#!/usr/bin/env bash
# Test-split inference (cone/scripts/inference_ego4d_test.sh equivalent):
# test.jsonl carries no GT timestamps, so the printed recall tables are
# meaningless — the product is submission_ego4d_best.json for the
# challenge server. Use --fused for the single-dispatch device path.
set -euo pipefail
WORKDIR=${1:?usage: infer_ego4d_test.sh WORKDIR TEST_JSONL [RESULTS_DIR]}
TEST_PATH=${2:?path to reformatted test.jsonl (cone_tpu reformat --test_split)}
RESULTS_DIR=${3:-}

python -m cone_tpu.cli infer --workdir "$WORKDIR" --ckpt best \
  --eval_path "$TEST_PATH" \
  ${RESULTS_DIR:+--results_dir "$RESULTS_DIR"} \
  "${@:4}"
