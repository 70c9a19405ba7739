#!/bin/bash
# Round-4 chip phase 3 (runs after r4c_session_queue.sh): the
# precision=high speed row pairing the armHigh3x quality arm, and the
# speechB continuation pushing the speech-like curve further.
set -u
cd /root/repo
START=${1:-0}
LOG=/tmp/r4d_queue.log
ART=/root/repo/artifacts
mkdir -p "$ART" /tmp/esc_longrun
echo "=== r4d queue starting at step $START $(date -u)" | tee -a "$LOG"

step() { echo "--- step $1: $2 $(date -u)" | tee -a "$LOG"; }

if [ "$START" -le 0 ]; then
  step 0 "wait for r4c queue to finish (chip is serial)"
  while ! grep -q "r4c queue done" /tmp/r4c_queue.log 2>/dev/null; do
    sleep 30
  done
  echo "r4c done, proceeding $(date -u)" | tee -a "$LOG"
fi

if [ "$START" -le 1 ]; then
  step 1 "trainscan_b9_high: sustained speed of the bf16_3x arm"
  timeout 2400 python tools/perf_ablation.py --only trainscan_b9_high \
    --out "$ART/perf_ablation_trainscan_high.json" \
    > /tmp/r4_trainscan_high.log 2>&1
  echo "trainscan_high exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 2 ]; then
  step 2 "speechB: +20k steps from speechA at lr 1e-4 (curve push)"
  if [ -f /tmp/esc_longrun/speechA.ckpt ]; then
    timeout 10800 python tools/quality_longrun.py --steps 20000 \
      --pretrain-steps 0 --scan 500 --eval-every 5000 --lr 1e-4 \
      --mode scan --corpus speechlike \
      --init-ckpt /tmp/esc_longrun/speechA.ckpt \
      --save-ckpt /tmp/esc_longrun/speechB.ckpt \
      --out "$ART/speechB.json" \
      > /tmp/esc_longrun/speechB.log 2>&1
    echo "speechB exit=$?" | tee -a "$LOG"
    [ -f /tmp/esc_longrun/speechB.ckpt ] && \
      cp /tmp/esc_longrun/speechB.ckpt "$ART/speechB.ckpt"
    timeout 3600 python tools/eval_bitrate_curve.py \
      --ckpt /tmp/esc_longrun/speechB.ckpt --corpus speechlike \
      --out "$ART/bitrate_curve_speechB.json" \
      > /tmp/r4_curve_speechB.log 2>&1
    echo "speechB curve exit=$?" | tee -a "$LOG"
  else
    echo "speechA.ckpt missing — skipping speechB" | tee -a "$LOG"
  fi
fi

echo "=== r4d queue done $(date -u)" | tee -a "$LOG"
