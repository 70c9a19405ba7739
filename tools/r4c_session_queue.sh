#!/bin/bash
# Round-4 chip phase 2 (after r4b_session_queue.sh): sustained-throughput
# rows, the speech-like from-scratch quality run, and the precision=high arm.
set -u
cd /root/repo
START=${1:-1}
LOG=/tmp/r4c_queue.log
ART=/root/repo/artifacts
mkdir -p "$ART" /tmp/esc_longrun
echo "=== r4c queue starting at step $START $(date -u)" | tee -a "$LOG"

step() { echo "--- step $1: $2 $(date -u)" | tee -a "$LOG"; }

if [ "$START" -le 1 ]; then
  step 1 "trainscan rows: sustained scan-mode train throughput (honest per-device number)"
  timeout 5400 python tools/perf_ablation.py --only trainscan \
    --out "$ART/perf_ablation_trainscan.json" > /tmp/r4_trainscan.log 2>&1
  echo "trainscan exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 2 ]; then
  step 2 "speechA: 40k steps from scratch on the transient-anchored speechlike corpus"
  timeout 21600 python tools/quality_longrun.py --steps 40000 \
    --pretrain-steps 5000 --scan 500 --eval-every 5000 --lr 4e-4 \
    --mode scan --corpus speechlike \
    --save-ckpt /tmp/esc_longrun/speechA.ckpt \
    --out "$ART/speechA.json" \
    > /tmp/esc_longrun/speechA.log 2>&1
  echo "speechA exit=$?" | tee -a "$LOG"
  [ -f /tmp/esc_longrun/speechA.ckpt ] && \
    cp /tmp/esc_longrun/speechA.ckpt "$ART/speechA.ckpt"
  timeout 3600 python tools/eval_bitrate_curve.py \
    --ckpt /tmp/esc_longrun/speechA.ckpt --corpus speechlike \
    --out "$ART/bitrate_curve_speechA.json" \
    > /tmp/r4_curve_speech.log 2>&1
  echo "speech curve exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 3 ]; then
  step 3 "armHigh: 10k steps at matmul precision=high (bf16_3x) from stageD"
  JAX_DEFAULT_MATMUL_PRECISION=high timeout 7200 \
    python tools/quality_longrun.py --steps 10000 --pretrain-steps 0 \
    --scan 500 --eval-every 2500 --lr 1e-4 --mode scan \
    --init-ckpt /root/repo/artifacts/stageD.ckpt \
    --out "$ART/armHigh3x.json" \
    > /tmp/esc_longrun/armHigh3x.log 2>&1
  echo "armHigh3x exit=$?" | tee -a "$LOG"
fi

echo "=== r4c queue done $(date -u)" | tee -a "$LOG"
