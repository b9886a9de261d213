#!/bin/bash
# Chip runbook: 3-seed best-recipe retrain -> per-seed pipeline eval ->
# deep-ensemble eval -> TTA merge-mode sweep. Idempotent: finished stages
# (summary.json present / checkpoint dir present) are skipped, so the script
# can be re-fired after a chip wedge. Every stage is timeout-wrapped.
#
#   RUN=/root/run_r5 EVAL=/root/eval_r5 bash tools/round_eval.sh
set -u
cd /root/repo
export DATA=${DATA:-/root/data/DIC-C2DH-HeLa}
export RUN=${RUN:-/root/run_r5}
export EVAL=${EVAL:-/root/eval_r5}
mkdir -p "$RUN" "$EVAL"

log() { echo "[round_eval $(date +%H:%M:%S)] $*"; }

for s in 0 1 2; do
  if [ ! -f "$RUN/s$s/.done" ]; then
    log "train seed $s"
    timeout 1800 python -m unetseg_tpu train --config configs/best_recipe.json \
      --data-root "$DATA" --sequences 01 02 --seed "$s" \
      --checkpoint-dir "$RUN/s$s" --metrics-jsonl "$EVAL/train_s$s.jsonl" \
      > "$EVAL/train_s$s.log" 2>&1 \
      && touch "$RUN/s$s/.done" || log "train seed $s FAILED rc=$?"
  fi
done

eval_one() { # name ckpt [extra pipeline flags...]
  local name=$1 ckpt=$2; shift 2
  if [ -f "$EVAL/$name/summary.json" ]; then return 0; fi
  log "eval $name"
  mkdir -p "$EVAL/$name"
  timeout 2400 python -m unetseg_tpu pipeline --config configs/best_recipe.json \
    --data-root "$DATA" --sequences 01 02 --skip-preprocess --skip-train \
    --checkpoint-dir "$ckpt" --output-dir "$EVAL/$name" "$@" \
    > "$EVAL/$name/log.txt" 2>&1 || log "eval $name FAILED rc=$?"
}

# Every row pins ALL sweep axes explicitly — best_recipe.json now ships
# the flagship inference settings (vote merges, temporal_bidi), so relying
# on config defaults would silently relabel every baseline row.
BASE=(--tta none --ensemble-merge mean --no-temporal-bidi)
for s in 0 1 2; do
  [ -f "$RUN/s$s/.done" ] && eval_one "s$s" "$RUN/s$s" "${BASE[@]}"
done

if [ -f "$RUN/s0/.done" ] && [ -f "$RUN/s1/.done" ] && [ -f "$RUN/s2/.done" ]; then
  ENS="$RUN/s0,$RUN/s1,$RUN/s2"
  eval_one ens            "$ENS" "${BASE[@]}"
  eval_one ens_tta_gmean  "$ENS" --tta flips --tta-merge gmean --ensemble-merge mean --no-temporal-bidi
  eval_one ens_tta_mean   "$ENS" --tta flips --tta-merge mean --ensemble-merge mean --no-temporal-bidi
  eval_one ens_tta_vote   "$ENS" --tta flips --tta-merge vote --ensemble-merge mean --no-temporal-bidi
  eval_one flagship       "$ENS" --tta flips --tta-merge vote --ensemble-merge vote --temporal-bidi
fi
# single-model TTA merge sweep (VERDICT item 5) on seed 0
if [ -f "$RUN/s0/.done" ]; then
  eval_one s0_tta_gmean "$RUN/s0" --tta flips --tta-merge gmean --no-temporal-bidi
  eval_one s0_tta_vote  "$RUN/s0" --tta flips --tta-merge vote --no-temporal-bidi
  eval_one s0_tta_mean  "$RUN/s0" --tta flips --tta-merge mean --no-temporal-bidi
fi

log "collecting summaries"
python - <<'EOF'
import json, os
EVAL = os.environ.get("EVAL", "/root/eval_r5")
out = {}
for name in sorted(os.listdir(EVAL)):
    p = os.path.join(EVAL, name, "summary.json")
    if os.path.isfile(p):
        with open(p) as f:
            out[name] = json.load(f)
print(json.dumps(out, indent=1))
with open(os.path.join(EVAL, "all_summaries.json"), "w") as f:
    json.dump(out, f, indent=1)
EOF
log "done"
