#!/usr/bin/env bash
# Ego4D-NLQ with RoBERTa text-token features (768-d) — the t_feat_dim-only
# variant of cone/scripts/train_ego4d_roberta.sh.
set -euo pipefail
FEATURE_ROOT=${FEATURE_ROOT:?}
DATA_ROOT=${DATA_ROOT:?}
WORKDIR=${WORKDIR:-results/ego4d-roberta-$(date +%Y_%m_%d_%H_%M_%S)}

python -m cone_tpu.cli train \
  --preset ego4d \
  --workdir "$WORKDIR" \
  --train_path "$DATA_ROOT/train_v1.jsonl" \
  --eval_path "$DATA_ROOT/val.jsonl" \
  --set model.t_feat_dim=768 \
  --set data.appearance_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.t_feat_dir="$FEATURE_ROOT/text_roberta" \
  --mesh "$@"
