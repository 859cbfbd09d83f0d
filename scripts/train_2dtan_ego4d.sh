#!/usr/bin/env bash
# CONE-TAN (2D-TAN head) on Ego4D — counterpart of
# cone_2dtan/experiments/ego4d/2D-TAN-64x64-K9L4-pool-sw-*.yaml:
# 64-clip windows @ 0.5333 s, sparse scales [16,8,8], K9L4 map convs,
# RoBERTa 768-d tokens, adapter NCE.
set -euo pipefail
FEATURE_ROOT=${FEATURE_ROOT:?}
DATA_ROOT=${DATA_ROOT:?}
WORKDIR=${WORKDIR:-results/tan-ego4d-$(date +%Y_%m_%d_%H_%M_%S)}

python -m cone_tpu.cli train \
  --preset tan_ego4d \
  --workdir "$WORKDIR" \
  --train_path "$DATA_ROOT/train_v1.jsonl" \
  --eval_path "$DATA_ROOT/val.jsonl" \
  --set data.clip_length=0.5333 \
  --set data.appearance_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.t_feat_dir="$FEATURE_ROOT/text_roberta" \
  --mesh "$@"
