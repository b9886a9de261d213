#!/bin/bash
# Round-8 chip runbook (idempotent, re-fireable after a chip wedge):
#   wave 1: 3-seed best-recipe retrain WITH EMA -> raw-vs-EMA eval matrix
#   wave 2: faint-cell label-rescue single-seed A/B (leak-free: model
#           trained on rescued-01 labels evaluates seq 02, and vice versa)
#   wave 3: fused dec-entry / tier-2 interleaved train-step A/B
#
#   RUN=/root/run_r8 EVAL=/root/eval_r8 bash tools/round8_eval.sh
set -u
cd /root/repo
DATA=${DATA:-/root/data/DIC-C2DH-HeLa}
RUN=${RUN:-/root/run_r8}
EVAL=${EVAL:-/root/eval_r8}
mkdir -p "$RUN" "$EVAL"
log() { echo "[round8 $(date +%H:%M:%S)] $*"; }

# rescue overlay roots (CPU, idempotent)
[ -d /root/data/HeLa-rescue01 ] || python -m unetseg_tpu rescue-labels \
  --data-root "$DATA" --output-root /root/data/HeLa-rescue01 \
  --rescue-sequences 01 --passthrough-sequences 02
[ -d /root/data/HeLa-rescue02 ] || python -m unetseg_tpu rescue-labels \
  --data-root "$DATA" --output-root /root/data/HeLa-rescue02 \
  --rescue-sequences 02 --passthrough-sequences 01

train_one() { # name data_root seed
  local name=$1 root=$2 seed=$3
  [ -f $RUN/$name/.done ] && return 0
  log "train $name"
  timeout 2400 python -m unetseg_tpu train --config configs/best_recipe.json \
    --data-root "$root" --sequences 01 02 --seed "$seed" --ema-decay 0.999 \
    --checkpoint-dir $RUN/$name --metrics-jsonl $EVAL/train_$name.jsonl \
    > $EVAL/train_$name.log 2>&1 \
    && touch $RUN/$name/.done || log "train $name FAILED rc=$?"
}
eval_one() { # name ckpt seqs [flags...]
  local name=$1 ckpt=$2 seqs=$3; shift 3
  [ -f "$EVAL/$name/summary.json" ] && return 0
  log "eval $name"
  mkdir -p "$EVAL/$name"
  timeout 2400 python -m unetseg_tpu pipeline --config configs/best_recipe.json \
    --data-root "$DATA" --sequences $seqs --skip-preprocess --skip-train \
    --checkpoint-dir "$ckpt" --output-dir "$EVAL/$name" "$@" \
    > "$EVAL/$name/log.txt" 2>&1 || log "eval $name FAILED rc=$?"
}

# ---- wave 1: seeds + raw/EMA matrix ----
for s in 0 1 2; do train_one s$s "$DATA" $s; done
BASE=(--tta none --ensemble-merge mean --no-temporal-bidi)
for s in 0 1 2; do
  eval_one "s$s"       $RUN/s$s "01 02" "${BASE[@]}"
  eval_one "s${s}_ema" $RUN/s$s "01 02" "${BASE[@]}" --ema
done
ENS3="$RUN/s0,$RUN/s1,$RUN/s2"
ENS="$ENS3"
eval_one flagship     "$ENS" "01 02" --tta flips --tta-merge vote --ensemble-merge vote --temporal-bidi
eval_one flagship_ema "$ENS" "01 02" --tta flips --tta-merge vote --ensemble-merge vote --temporal-bidi --ema
eval_one ens          "$ENS" "01 02" "${BASE[@]}"
eval_one ens_ema      "$ENS" "01 02" "${BASE[@]}" --ema

# ---- wave 2: label rescue (leak-free cross-sequence evals) ----
train_one a0 /root/data/HeLa-rescue01 0
train_one b0 /root/data/HeLa-rescue02 0
eval_one a0_seq02     $RUN/a0 02 "${BASE[@]}"
eval_one a0_seq02_ema $RUN/a0 02 "${BASE[@]}" --ema
eval_one b0_seq01     $RUN/b0 01 "${BASE[@]}"
eval_one b0_seq01_ema $RUN/b0 01 "${BASE[@]}" --ema

# ---- flagship variants: mixed raw+EMA and 6 fresh seeds ----
eval_one flagship_mix6 "$ENS3" "01 02" --tta flips --tta-merge vote --ensemble-merge vote --temporal-bidi --ema-both
for s in 3 4 5; do train_one s$s "$DATA" $s; done
ENS6F="$RUN/s0,$RUN/s1,$RUN/s2,$RUN/s3,$RUN/s4,$RUN/s5"
eval_one flagship6f "$ENS6F" "01 02" --tta flips --tta-merge vote --ensemble-merge vote --temporal-bidi

# ---- wave 3: perf A/B ----
if [ ! -f $EVAL/dec0_ab.log ]; then
  log "dec0/tier2 A/B"
  timeout 3000 python tools/dec0_ab.py 2 > $EVAL/dec0_ab.log 2>&1 || log "AB FAILED"
fi

log "collecting"
python tools/collect_results.py $EVAL || true
log "done"
