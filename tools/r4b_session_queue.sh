#!/bin/bash
# Round-4 second-session chip queue — adapted from r4_tpu_queue.sh to the
# remaining wall clock (~6h) after the container recycle. Serial on
# purpose (concurrent TPU jobs serialize on the chip and look hung).
# bench.py (step 1 of the original queue) runs separately before this.
#
# Usage: bash tools/r4b_session_queue.sh [start_step]
set -u
cd /root/repo
START=${1:-1}
LOG=/tmp/r4b_queue.log
ART=/root/repo/artifacts
mkdir -p "$ART" /tmp/esc_longrun
echo "=== r4b queue starting at step $START $(date -u)" | tee -a "$LOG"

step() { echo "--- step $1: $2 $(date -u)" | tee -a "$LOG"; }

if [ "$START" -le 1 ]; then
  step 1 "nsRescue: +10k steps from stageC at dropout 1.0 (cliff diagnosis test)"
  timeout 9000 python tools/quality_longrun.py --steps 10000 \
    --pretrain-steps 0 --scan 500 --eval-every 2500 --lr 1e-4 \
    --mode scan --dropout-rate 1.0 \
    --init-ckpt /tmp/esc_longrun/stageC.ckpt \
    --save-ckpt /tmp/esc_longrun/nsRescue.ckpt \
    --out "$ART/nsRescue.json" \
    > /tmp/esc_longrun/nsRescue.log 2>&1
  echo "nsRescue exit=$?" | tee -a "$LOG"
  timeout 3600 python tools/eval_bitrate_curve.py \
    --ckpt /tmp/esc_longrun/nsRescue.ckpt \
    --out "$ART/bitrate_curve_nsRescue.json" \
    > /tmp/r4_curve_rescue.log 2>&1
  echo "rescue curve exit=$?" | tee -a "$LOG"
  [ -f /tmp/esc_longrun/nsRescue.ckpt ] && \
    cp /tmp/esc_longrun/nsRescue.ckpt "$ART/nsRescue.ckpt"
fi

if [ "$START" -le 2 ]; then
  step 2 "perf_ablation train rows incl. scoped-precision + MXU-aligned geometry"
  timeout 5400 python tools/perf_ablation.py --only train \
    --out "$ART/perf_ablation_train.json" > /tmp/r4_perf_ablation.log 2>&1
  echo "perf_ablation train exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 3 ]; then
  step 3 "armScoped: 10k steps enc+dec MXU-default (per-op HIGHEST kept) from stageC"
  timeout 9000 python tools/quality_longrun.py --steps 10000 \
    --pretrain-steps 0 --scan 500 --eval-every 2500 --lr 1e-4 \
    --mode scan --enc-precision default --dec-precision default \
    --init-ckpt /tmp/esc_longrun/stageC.ckpt \
    --out "$ART/armScoped.json" \
    > /tmp/esc_longrun/armScoped.log 2>&1
  echo "armScoped exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 4 ]; then
  step 4 "stageD: continue best ckpt toward the 8.3 dB bar; SAVE + persist"
  CKPT=/tmp/esc_longrun/nsRescue.ckpt
  [ -f "$CKPT" ] || CKPT=/tmp/esc_longrun/stageC.ckpt
  timeout 10800 python tools/quality_longrun.py --steps 10000 \
    --pretrain-steps 0 --scan 500 --eval-every 2500 --lr 1e-4 \
    --mode scan --init-ckpt "$CKPT" \
    --save-ckpt /tmp/esc_longrun/stageD.ckpt \
    --out "$ART/stageD.json" \
    > /tmp/esc_longrun/stageD.log 2>&1
  echo "stageD exit=$?" | tee -a "$LOG"
  [ -f /tmp/esc_longrun/stageD.ckpt ] && \
    cp /tmp/esc_longrun/stageD.ckpt "$ART/stageD.ckpt"
  timeout 3600 python tools/eval_bitrate_curve.py \
    --ckpt /tmp/esc_longrun/stageD.ckpt \
    --out "$ART/bitrate_curve_stageD.json" \
    > /tmp/r4_curve_stageD.log 2>&1
  echo "stageD curve exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 5 ]; then
  step 5 "perf_ablation rt/encdec rows (BENCH_EXTRA refresh inputs)"
  timeout 5400 python tools/perf_ablation.py --only rt \
    --out "$ART/perf_ablation_rt.json" > /tmp/r4_perf_rt.log 2>&1
  echo "perf_ablation rt exit=$?" | tee -a "$LOG"
fi

echo "=== r4b queue done $(date -u)" | tee -a "$LOG"
