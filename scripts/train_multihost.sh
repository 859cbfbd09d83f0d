#!/usr/bin/env bash
# Multi-host (DCN) training launcher.
#
# TPU pods: run this same command on EVERY worker (topology auto-detects;
# no coordinator flags needed):
#   FEATURE_ROOT=... DATA_ROOT=... WORKDIR=/shared/run scripts/train_multihost.sh
#
# CPU clusters / tests: pass the explicit layout, e.g. 2 processes:
#   COORD=host0:12345 NPROC=2 PROC_ID=0 ... scripts/train_multihost.sh   # on host0
#   COORD=host0:12345 NPROC=2 PROC_ID=1 ... scripts/train_multihost.sh   # on host1
#
# Requirements: WORKDIR on a filesystem shared by all hosts (process 0
# writes checkpoints/logs; resume checks agreement); identical data on
# every host (each process materializes only its row block of each batch).
set -euo pipefail
FEATURE_ROOT=${FEATURE_ROOT:?}
DATA_ROOT=${DATA_ROOT:?}
WORKDIR=${WORKDIR:?set WORKDIR to a SHARED path}

EXTRA=()
if [[ -n "${COORD:-}" ]]; then
  EXTRA+=(--coordinator "$COORD" --num_processes "${NPROC:?}" --process_id "${PROC_ID:?}")
fi

python -m cone_tpu.cli train \
  --preset "${PRESET:-ego4d}" \
  --workdir "$WORKDIR" \
  --train_path "$DATA_ROOT/train_v1.jsonl" \
  --eval_path "$DATA_ROOT/val.jsonl" \
  --set data.appearance_feat_dir="$FEATURE_ROOT/video.cfs" \
  --set data.t_feat_dir="$FEATURE_ROOT/text" \
  --distributed --mesh ${EXTRA[@]+"${EXTRA[@]}"} "$@"
