#!/usr/bin/env bash
# Real-data recall-parity runbook, Ego4D-NLQ (docs/REAL_DATA.md).
#
# Given the reference's REAL released assets — the official nlq_val.json,
# the EgoVLP feature LMDBs, and a trained reference checkpoint — this one
# command converts everything through the production surfaces, infers, runs
# the official evaluator, and diffs against the published README row
# (/root/reference/README.md:127-129: R1@0.3=14.15 R5@0.3=30.33
# R1@0.5=8.18 R5@0.5=18.02). Exits nonzero if any metric is off by more
# than EXPECT_TOL recall points.
#
# usage: parity_ego4d.sh WORKDIR RAW_VAL_JSON CKPT VIDEO_SRC TOKENS_SRC CLS_SRC \
#            [SRC_FORMAT=lmdb] [EXPECT=...] [EXPECT_TOL=0.5]
#
#   WORKDIR     output directory (created)
#   RAW_VAL_JSON official nested challenge json (also the eval GT)
#   CKPT        reference torch checkpoint (model_best.ckpt)
#   VIDEO_SRC   video features (lmdb dir / npy dir / .cfs passthrough)
#   TOKENS_SRC  query token features
#   CLS_SRC     query cls features
#   SRC_FORMAT  lmdb | npy_dir | pt_dir | h5 | cfs   (cfs = already converted)
#   EXPECT      metric row to diff (R<k>@<t>=<pct>, comma separated)
#   EXPECT_TOL  absolute tolerance in recall points
set -euo pipefail
WORKDIR=${1:?usage: parity_ego4d.sh WORKDIR RAW_VAL_JSON CKPT VIDEO_SRC TOKENS_SRC CLS_SRC [SRC_FORMAT] [EXPECT] [EXPECT_TOL]}
RAW_JSON=${2:?}
CKPT=${3:?}
VIDEO_SRC=${4:?}
TOKENS_SRC=${5:?}
CLS_SRC=${6:?}
SRC_FORMAT=${7:-lmdb}
EXPECT=${8:-"R1@0.3=14.15,R5@0.3=30.33,R1@0.5=8.18,R5@0.5=18.02"}
EXPECT_TOL=${9:-0.5}
# geometry preset for the released checkpoint; override e.g. for a CLIP/
# RoBERTa-token model (t_feat_dim) with extra --set flags
PRESET=${PRESET:-ego4d}
EXTRA_SET=${EXTRA_SET:-}

mkdir -p "$WORKDIR/features/text"

# 1. challenge json -> flat eval jsonl (data/reformat.py)
python -m cone_tpu.cli reformat --dset ego4d \
  --input "$RAW_JSON" --output "$WORKDIR/val.jsonl"

# 2. feature stores -> packed .cfs (skipped for already-converted stores)
convert() { # src dst
  if [ "$SRC_FORMAT" = cfs ]; then
    ln -sfn "$(readlink -f "$1")" "$2"
  else
    python -m cone_tpu.cli convert-store --format "$SRC_FORMAT" \
      --input "$1" --output "$2"
  fi
}
convert "$VIDEO_SRC"  "$WORKDIR/features/video.cfs"
convert "$TOKENS_SRC" "$WORKDIR/features/text/tokens.cfs"
convert "$CLS_SRC"    "$WORKDIR/features/text/cls.cfs"

# 3. reference torch checkpoint -> cone_tpu workdir (converter is
#    key-coverage-tested against the live reference state dict)
if [ -f "$PRESET" ]; then CFG_ARG=(--config "$PRESET"); else CFG_ARG=(--preset "$PRESET"); fi
python -m cone_tpu.cli train "${CFG_ARG[@]}" --workdir "$WORKDIR/run" \
  --dump_config "$WORKDIR/run/config.json" \
  --set data.appearance_feat_dir="$WORKDIR/features/video.cfs" \
  --set data.t_feat_dir="$WORKDIR/features/text" $EXTRA_SET
python "$(dirname "$0")/../tools/convert_ckpt.py" --ckpt "$CKPT" \
  --workdir "$WORKDIR/run" --config "$WORKDIR/run/config.json"

# 4. inference (fused TPU pipeline) + challenge submission file
python -m cone_tpu.cli infer --workdir "$WORKDIR/run" --ckpt converted \
  --eval_path "$WORKDIR/val.jsonl" --save_all --ego4d_gt "$RAW_JSON"

# 5. official evaluator + parity diff vs the published row
python -m cone_tpu.cli eval \
  --submission "$WORKDIR/run/submission_ego4d_converted.json" \
  --ego4d_gt "$RAW_JSON" \
  --expect "$EXPECT" --expect_tol "$EXPECT_TOL"
