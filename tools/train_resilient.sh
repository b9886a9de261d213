#!/bin/bash
# Wedge-resilient training: run `unetseg_tpu train` under a timeout and
# relaunch with --resume until it finishes or the attempt budget runs out.
# The remote chip can wedge for 30+ min; full checkpoints land every
# TrainConfig.full_save_interval epochs, so a killed run loses at most
# that many epochs.
#
# Usage: tools/train_resilient.sh <per-attempt-timeout-sec> <max-attempts> \
#            <train args...>
# Example:
#   tools/train_resilient.sh 1500 4 --config configs/best_recipe.json \
#       --data-root DATA --sequences 01 02 --checkpoint-dir ./ckpt
set -u
TMO=$1; shift
MAX=$1; shift
attempt=0
resume=""
while [ "$attempt" -lt "$MAX" ]; do
  attempt=$((attempt + 1))
  echo "[train_resilient] attempt $attempt/$MAX $resume"
  timeout "$TMO" python -m unetseg_tpu train "$@" $resume
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[train_resilient] finished on attempt $attempt"
    exit 0
  fi
  echo "[train_resilient] attempt $attempt exited rc=$rc; retrying with --resume"
  resume="--resume"
done
echo "[train_resilient] giving up after $MAX attempts"
exit 1
