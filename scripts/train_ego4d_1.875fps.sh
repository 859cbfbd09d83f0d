#!/usr/bin/env bash
# Ego4D training on 1.875 fps EgoVLP features
# (cone/scripts/train_ego4d_1.875fps.sh equivalent): identical recipe to
# train_ego4d.sh except clip_length = 1/1.875 = 0.53333 s and the window
# length / query count come from the command line (the reference sweeps
# max_v_l / num_queries at this feature rate).
set -euo pipefail
FEATURE_ROOT=${FEATURE_ROOT:?path containing video.cfs and text/{tokens,cls}.cfs}
DATA_ROOT=${DATA_ROOT:?path containing train_v1.jsonl and val.jsonl}
MAX_V_L=${MAX_V_L:-90}
NUM_QUERIES=${NUM_QUERIES:-5}
WORKDIR=${WORKDIR:-results/ego4d-1.875fps-${MAX_V_L}-${NUM_QUERIES}-$(date +%Y_%m_%d_%H_%M_%S)}

python -m cone_tpu.cli train \
  --preset ego4d \
  --workdir "$WORKDIR" \
  --train_path "$DATA_ROOT/train_v1.jsonl" \
  --eval_path "$DATA_ROOT/val.jsonl" \
  --set data.appearance_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.motion_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.t_feat_dir="$FEATURE_ROOT/text" \
  --set data.clip_length=0.53333 \
  --set data.max_v_l="$MAX_V_L" \
  --set model.max_v_l="$MAX_V_L" \
  --set model.num_queries="$NUM_QUERIES" \
  --mesh \
  "$@"
