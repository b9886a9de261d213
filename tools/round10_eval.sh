#!/bin/bash
# Round-10 chip runbook (idempotent, re-fireable after a chip wedge):
#   wave 1: epoch-budget axis — 3 seeds x {120, 160} epochs (VERDICT-r4
#           item 2), interleaved by seed so a truncated run still covers
#           both budgets; each member evals raw + EMA right after training
#   wave 2: flagship ensembles at each budget (vote x vote + bidi)
#   wave 3: member-count sweep at 80 epochs (VERDICT-r4 item 3): three
#           extra members e3..e5 + 5/6-member flagships on top of the
#           freshly reproduced /root/run_flagship/f{0,1,2}
#
#   RUN=/root/run_r10 EVAL=/root/eval_r10 bash tools/round10_eval.sh
#
# Run from a code SNAPSHOT (cp -a /root/repo /root/run10_code; cd there)
# so live edits in /root/repo cannot drift a mid-flight wave.
set -u
DATA=${DATA:-/root/data/DIC-C2DH-HeLa}
RUN=${RUN:-/root/run_r10}
EVAL=${EVAL:-/root/eval_r10}
F80=${F80:-/root/run_flagship}
mkdir -p "$RUN" "$EVAL"
log() { echo "[round10 $(date +%H:%M:%S)] $*"; }

train_one() { # name seed epochs
  local name=$1 seed=$2 epochs=$3
  [ -f $RUN/$name/.done ] && return 0
  log "train $name (epochs=$epochs seed=$seed)"
  timeout 3600 python -m unetseg_tpu train --config configs/best_recipe.json \
    --data-root "$DATA" --sequences 01 02 --seed "$seed" --epochs "$epochs" \
    --checkpoint-dir $RUN/$name --metrics-jsonl $EVAL/train_$name.jsonl \
    > $EVAL/train_$name.log 2>&1 \
    && { touch $RUN/$name/.done;
         # a (re)train invalidates any eval made from partial checkpoints
         # (e.g. a timeout mid-run followed by a re-fire)
         rm -f "$EVAL/$name/summary.json" "$EVAL/${name}_ema/summary.json"; } \
    || log "train $name FAILED rc=$?"
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
BASE=(--tta none --ensemble-merge mean --no-temporal-bidi)
FLAG=(--tta flips --tta-merge vote --ensemble-merge vote --temporal-bidi)

# ---- wave 0: per-conv trace attribution (VERDICT item 1, ~10 min) ----
if [ ! -f "$EVAL/kprofile_conv.log" ]; then
  log "kprofile_conv (per-stage XLA conv trace attribution)"
  timeout 1800 python tools/kprofile_conv.py > "$EVAL/kprofile_conv.log" 2>&1 \
    || log "kprofile FAILED rc=$?"
fi

# ---- wave 1: budget sweep, seed-interleaved, eval-after-train ----
# `touch /tmp/stop_runbook` finishes the current member then jumps to
# collection (session-end discipline: the driver bench needs a free chip).
for s in 0 1 2; do
  for b in 120 160; do
    [ -f /tmp/stop_runbook ] && { log "stop_runbook set - bailing"; break 2; }
    train_one t${b}_s$s $s $b
    eval_one "t${b}_s$s"       $RUN/t${b}_s$s "01 02" "${BASE[@]}"
    eval_one "t${b}_s${s}_ema" $RUN/t${b}_s$s "01 02" "${BASE[@]}" --ema
  done
done

# ---- wave 2: flagship ensembles per budget ----
# stop_runbook skips these too (the switch means "free the chip ASAP")
if [ ! -f /tmp/stop_runbook ]; then
  ENS120="$RUN/t120_s0,$RUN/t120_s1,$RUN/t120_s2"
  ENS160="$RUN/t160_s0,$RUN/t160_s1,$RUN/t160_s2"
  eval_one flagship120 "$ENS120" "01 02" "${FLAG[@]}"
  eval_one flagship160 "$ENS160" "01 02" "${FLAG[@]}"
fi

# ---- wave 3: 80-epoch member-count sweep on top of f0..f2 ----
# Kill-switch: `touch /tmp/skip_wave3` at any point skips the wave (used
# near session end so the driver's bench gets a free chip); stop_runbook
# implies it.
[ -f /tmp/skip_wave3 ] || [ -f /tmp/stop_runbook ] && SKIP_WAVE3=1
if [ "${SKIP_WAVE3:-0}" != 1 ]; then
  for s in 3 4 5; do
    train_one e$s $s 80
    eval_one "e$s" $RUN/e$s "01 02" "${BASE[@]}"
  done
  ENS80_5="$F80/f0,$F80/f1,$F80/f2,$RUN/e3,$RUN/e4"
  ENS80_6="$ENS80_5,$RUN/e5"
  eval_one flagship80_5 "$ENS80_5" "01 02" "${FLAG[@]}"
  eval_one flagship80_6 "$ENS80_6" "01 02" "${FLAG[@]}"
fi

log "collecting"
python tools/collect_results.py "$EVAL" || true
log "round10 runbook complete"
touch $EVAL/.runbook_done
