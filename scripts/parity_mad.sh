#!/usr/bin/env bash
# Real-data recall-parity runbook, MAD (docs/REAL_DATA.md).
#
# Same chain as parity_ego4d.sh for the MAD benchmark: convert the CLIP
# feature stores + a trained reference checkpoint, infer, evaluate with the
# flat-jsonl MAD evaluator, and diff against the published README row
# (/root/reference/README.md:166-170, val split: R1@0.3=6.73 R5@0.3=15.20
# R10@0.3=20.07 R50@0.3=32.09).
#
# usage: parity_mad.sh WORKDIR VAL_JSONL CKPT VIDEO_SRC TOKENS_SRC CLS_SRC \
#            [SRC_FORMAT=lmdb] [EXPECT=...] [EXPECT_TOL=0.5]
#
#   VAL_JSONL   flat eval jsonl (query_id + timestamps; MAD annotations
#               reformat with `cone_tpu reformat --dset mad` first if you
#               start from the raw MAD json)
set -euo pipefail
WORKDIR=${1:?usage: parity_mad.sh WORKDIR VAL_JSONL CKPT VIDEO_SRC TOKENS_SRC CLS_SRC [SRC_FORMAT] [EXPECT] [EXPECT_TOL]}
VAL_JSONL=${2:?}
CKPT=${3:?}
VIDEO_SRC=${4:?}
TOKENS_SRC=${5:?}
CLS_SRC=${6:?}
SRC_FORMAT=${7:-lmdb}
EXPECT=${8:-"R1@0.3=6.73,R5@0.3=15.20,R10@0.3=20.07,R50@0.3=32.09"}
EXPECT_TOL=${9:-0.5}
PRESET=${PRESET:-mad}
EXTRA_SET=${EXTRA_SET:-}

mkdir -p "$WORKDIR/features/text"

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

if [ -f "$PRESET" ]; then CFG_ARG=(--config "$PRESET"); else CFG_ARG=(--preset "$PRESET"); fi
python -m cone_tpu.cli train "${CFG_ARG[@]}" --workdir "$WORKDIR/run" \
  --dump_config "$WORKDIR/run/config.json" \
  --set data.appearance_feat_dir="$WORKDIR/features/video.cfs" \
  --set data.t_feat_dir="$WORKDIR/features/text" $EXTRA_SET

python "$(dirname "$0")/../tools/convert_ckpt.py" --ckpt "$CKPT" \
  --workdir "$WORKDIR/run" --config "$WORKDIR/run/config.json"

python -m cone_tpu.cli infer --workdir "$WORKDIR/run" --ckpt converted \
  --eval_path "$VAL_JSONL" --save_all

python -m cone_tpu.cli eval --dset mad \
  --submission "$WORKDIR/run/inference_converted_preds.jsonl" \
  --gt "$VAL_JSONL" \
  --expect "$EXPECT" --expect_tol "$EXPECT_TOL"
