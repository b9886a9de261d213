#!/bin/bash
# Round-9 wave 5: flagship rows under the CURRENT repo code + recipe
# (boundary grow + per-seq override included via configs/best_recipe.json),
# over the candidate member sets from the epoch-budget sweep, then ship
# the winner (collect_results --ship re-stamps provenance).
#
#   bash tools/round9_final.sh            # after round9_eval.sh completes
set -u
cd "$(dirname "$0")/.."
DATA=${DATA:-/root/data/DIC-C2DH-HeLa}
RUN=${RUN:-/root/run_r9}
R8=${R8:-/root/run_r8}
EVAL=${EVAL:-/root/eval_r9}
mkdir -p "$EVAL"
log() { echo "[r9final $(date +%H:%M:%S)] $*"; }

eval_one() { # name ckpt [flags...]
  local name=$1 ckpt=$2; shift 2
  [ -f "$EVAL/$name/summary.json" ] && return 0
  log "eval $name"
  mkdir -p "$EVAL/$name"
  timeout 2400 python -m unetseg_tpu pipeline --config configs/best_recipe.json \
    --data-root "$DATA" --sequences 01 02 --skip-preprocess --skip-train \
    --checkpoint-dir "$ckpt" --output-dir "$EVAL/$name" "$@" \
    > "$EVAL/$name/log.txt" 2>&1 || log "eval $name FAILED rc=$?"
  [ -f "$EVAL/$name/summary.json" ] && cat "$EVAL/$name/summary.json"
}

# the flagship candidates: 80-epoch trio (current headline members),
# 120- and 160-epoch trios from this round's budget sweep — all with the
# recipe's vote x vote + bidi + boundary grow (config-driven, no flags)
eval_one flagshipG_80  "$R8/e0,$R8/e1,$R8/e2"
[ -d $RUN/t120_s2 ] && eval_one flagshipG_120 "$RUN/t120_s0,$RUN/t120_s1,$RUN/t120_s2"
[ -d $RUN/t160_s2 ] && eval_one flagshipG_160 "$RUN/t160_s0,$RUN/t160_s1,$RUN/t160_s2"

# seq-02 merge variants on the 80-ep trio (VERDICT item 6: the vote was
# tuned on noisy 40-ep members; probability-averaged merges may now score
# better SEG on seq 02). Sequence-02-only rows, ~3 min each.
eval_two() { # name ckpt [flags...]
  local name=$1 ckpt=$2; shift 2
  [ -f "$EVAL/$name/summary.json" ] && return 0
  log "eval $name (seq 02 only)"
  mkdir -p "$EVAL/$name"
  timeout 1800 python -m unetseg_tpu pipeline --config configs/best_recipe.json \
    --data-root "$DATA" --sequences 02 --skip-preprocess --skip-train \
    --checkpoint-dir "$ckpt" --output-dir "$EVAL/$name" "$@" \
    > "$EVAL/$name/log.txt" 2>&1 || log "eval $name FAILED rc=$?"
  [ -f "$EVAL/$name/summary.json" ] && cat "$EVAL/$name/summary.json"
}
E80="$R8/e0,$R8/e1,$R8/e2"
eval_two g80_02_memmean  "$E80" --ensemble-merge mean
eval_two g80_02_allmean  "$E80" --ensemble-merge mean --tta-merge mean
eval_two g80_02_ttamean  "$E80" --tta-merge mean

log "candidates done — pick the winner and run:"
log "  python tools/collect_results.py $EVAL --update-latest --ship <row> --run-dirs <dirs>"
