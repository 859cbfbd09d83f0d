#!/usr/bin/env bash
# ECCV'22 leaderboard recipe (cone/scripts/train_ego4d_clip_for_leaderboard.sh):
# CLIP text tokens (512-d) + the multiscale-window training loader (3 extra
# variable-length GT-covering windows per example,
# cone/ego4d_dataloader_for_eccv2022_workshop.py) + adapter loss from epoch 0
# (the reference sets start_epoch_for_adapter=-1). Single host (the
# multiscale batch layout cannot row-slice across processes).
set -euo pipefail
FEATURE_ROOT=${FEATURE_ROOT:?}
DATA_ROOT=${DATA_ROOT:?}
WORKDIR=${WORKDIR:-results/ego4d-leaderboard-$(date +%Y_%m_%d_%H_%M_%S)}

python -m cone_tpu.cli train \
  --preset ego4d \
  --workdir "$WORKDIR" \
  --train_path "$DATA_ROOT/train_v1.jsonl" \
  --eval_path "$DATA_ROOT/val.jsonl" \
  --set model.t_feat_dim=512 \
  --set train.multiscale=true \
  --set train.start_epoch_for_adapter=-1 \
  --set train.n_epoch=120 \
  --set train.lr_drop=80 \
  --set data.appearance_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.t_feat_dir="$FEATURE_ROOT/text_clip" \
  "$@"
