#!/usr/bin/env bash
# Canonical MAD training (CLIP 5 fps features) — hyperparameters per
# cone/scripts/train_mad.sh: window 125 @ 0.2 s/clip, 30 epochs, lr drop 25,
# top-30 windows, adapter_loss_coef 0.2, seed 2020.
set -euo pipefail
FEATURE_ROOT=${FEATURE_ROOT:?path containing video.cfs and text/{tokens,cls}.cfs}
DATA_ROOT=${DATA_ROOT:?path containing train_v1.jsonl and val.jsonl}
WORKDIR=${WORKDIR:-results/mad-$(date +%Y_%m_%d_%H_%M_%S)}

python -m cone_tpu.cli train \
  --preset mad \
  --workdir "$WORKDIR" \
  --train_path "$DATA_ROOT/train_v1.jsonl" \
  --eval_path "$DATA_ROOT/val.jsonl" \
  --set data.appearance_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.motion_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.t_feat_dir="$FEATURE_ROOT/text" \
  --mesh \
  "$@"
