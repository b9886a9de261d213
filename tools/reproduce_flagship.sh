#!/bin/bash
# One-command flagship reproduce (VERDICT round-4 item 5).
#
# Regenerates, from nothing but the repo + the read-only reference data
# mount, everything behind the shipped headline numbers:
#   1. stage a writable dataset root (reference data + chmod, idempotent)
#   2. preprocess seq-02 weight maps (seq-01's ship with the reference)
#   3. train 3 flagship members (best_recipe.json: 80-epoch cosine + EMA)
#   4. pipeline-eval the vote x vote + bidi ensemble (the recipe's infer
#      section carries the flagship settings - no extra flags)
#   5. publish the row: collect_results --ship flagship (provenance-stamped)
#
# Idempotent and wedge-tolerant: every step keys on a .done/summary marker,
# every chip job runs under timeout, and the whole script can simply be
# re-fired after a chip outage (epoch-scan training rides out wedges - see
# CLAUDE.md round-8 notes - so never kill a "stalled" train early).
#
#   bash tools/reproduce_flagship.sh            # ~30-50 min of chip
#   DATA=... RUN=... EVAL=... bash tools/reproduce_flagship.sh
set -u
cd "$(dirname "$0")/.."
REF=${REF:-/root/reference/data/raw/train/DIC-C2DH-HeLa}
DATA=${DATA:-/root/data/DIC-C2DH-HeLa}
RUN=${RUN:-/root/run_flagship}
EVAL=${EVAL:-/root/eval_flagship}
mkdir -p "$RUN" "$EVAL"
log() { echo "[reproduce $(date +%H:%M:%S)] $*"; }

# ---- 1. writable dataset root ----
if [ ! -d "$DATA" ]; then
  log "staging dataset from $REF"
  mkdir -p "$(dirname "$DATA")"
  cp -r "$REF" "$DATA"
  chmod -R u+w "$DATA"
fi

# ---- 2. seq-02 weight maps (CPU, ~5-15 min, idempotent via --force-less) ----
if [ ! -f "$DATA/02_ST/WEIGHT_MAPS/.done" ]; then
  log "preprocess seq-02 weight maps (CPU)"
  JAX_PLATFORMS=cpu timeout 3600 python -m unetseg_tpu preprocess \
    --data-root "$DATA" --sequence 02 \
    && touch "$DATA/02_ST/WEIGHT_MAPS/.done" \
    || { log "preprocess FAILED rc=$?"; exit 1; }
fi

# ---- 3. three flagship members ----
for s in 0 1 2; do
  [ -f "$RUN/f$s/.done" ] && continue
  log "train member f$s (seed $s, recipe epochs)"
  timeout 3600 python -m unetseg_tpu train --config configs/best_recipe.json \
    --data-root "$DATA" --sequences 01 02 --seed $s \
    --checkpoint-dir "$RUN/f$s" --metrics-jsonl "$EVAL/train_f$s.jsonl" \
    > "$EVAL/train_f$s.log" 2>&1 \
    && touch "$RUN/f$s/.done" || { log "train f$s FAILED rc=$?"; exit 1; }
done

# ---- 4. flagship eval row ----
ENS="$RUN/f0,$RUN/f1,$RUN/f2"
if [ ! -f "$EVAL/flagship/summary.json" ]; then
  log "pipeline eval (vote x vote + bidi from the shipped config)"
  mkdir -p "$EVAL/flagship"
  timeout 2400 python -m unetseg_tpu pipeline --config configs/best_recipe.json \
    --data-root "$DATA" --sequences 01 02 --skip-preprocess --skip-train \
    --checkpoint-dir "$ENS" --output-dir "$EVAL/flagship" \
    > "$EVAL/flagship/log.txt" 2>&1 || { log "eval FAILED rc=$?"; exit 1; }
fi
cat "$EVAL/flagship/summary.json"

# ---- 5. publish ----
log "publishing flagship row -> docs/results_latest.json"
python tools/collect_results.py "$EVAL" --update-latest \
  --ship flagship --run-dirs "$ENS"
log "done. headline now reproduced from scratch; see docs/results_latest.json"
