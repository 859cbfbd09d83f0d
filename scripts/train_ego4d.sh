#!/usr/bin/env bash
# Canonical Ego4D-NLQ training (EgoVLP features) — hyperparameters per
# cone/scripts/train_ego4d.sh in the reference: window 90 @ 0.535 s/clip,
# bsz 32, 150 epochs, lr drop at 120, top-20 windows, adapter from epoch 30.
set -euo pipefail
FEATURE_ROOT=${FEATURE_ROOT:?path containing video.cfs and text/{tokens,cls}.cfs}
DATA_ROOT=${DATA_ROOT:?path containing train_v1.jsonl and val.jsonl}
WORKDIR=${WORKDIR:-results/ego4d-$(date +%Y_%m_%d_%H_%M_%S)}

python -m cone_tpu.cli train \
  --preset ego4d \
  --workdir "$WORKDIR" \
  --train_path "$DATA_ROOT/train_v1.jsonl" \
  --eval_path "$DATA_ROOT/val.jsonl" \
  --set data.appearance_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.motion_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.t_feat_dir="$FEATURE_ROOT/text" \
  --mesh \
  "$@"
