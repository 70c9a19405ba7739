#!/bin/bash
# Round-3 remaining TPU queue. Serial on purpose: concurrent TPU jobs
# serialize on the chip and the second one looks hung (see
# .claude/skills/verify/SKILL.md). Each step logs to /tmp and is
# individually bounded by timeout.
#
# Usage: bash tools/r3_tpu_queue.sh [start_step]
set -u
cd /root/repo
START=${1:-1}
LOG=/tmp/r3_queue.log
echo "=== r3 queue starting at step $START $(date -u)" | tee -a "$LOG"

step() { echo "--- step $1: $2 $(date -u)" | tee -a "$LOG"; }

if [ "$START" -le 1 ]; then
  step 1 "bench_all -> BENCH_EXTRA.json (judge-facing refresh)"
  timeout 5400 python bench_all.py > /tmp/r3_bench_all.log 2>&1
  echo "bench_all exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 2 ]; then
  step 2 "stageD: 20k steps from stageC, SAVE ckpt"
  timeout 5400 python tools/quality_longrun.py --steps 20000 \
    --pretrain-steps 0 --scan 500 --eval-every 2500 --lr 1e-4 \
    --mode scan --init-ckpt /tmp/esc_longrun/stageC.ckpt \
    --save-ckpt /tmp/esc_longrun/stageD.ckpt \
    --out /tmp/esc_longrun/stageD.json \
    > /tmp/esc_longrun/stageD.log 2>&1
  echo "stageD exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 3 ]; then
  step 3 "precision=high arm: 10k steps from stageC (vs highest/default)"
  JAX_DEFAULT_MATMUL_PRECISION=high timeout 3600 \
    python tools/quality_longrun.py --steps 10000 --pretrain-steps 0 \
    --scan 500 --eval-every 2500 --lr 1e-4 --mode scan \
    --init-ckpt /tmp/esc_longrun/stageC.ckpt \
    --out /tmp/esc_longrun/armHigh.json \
    > /tmp/esc_longrun/armHigh.log 2>&1
  echo "armHigh exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 4 ]; then
  step 4 "bitrate curve on stageD ckpt (raw + aligned SI-SDR, ns=1..6)"
  CKPT=/tmp/esc_longrun/stageD.ckpt
  [ -f "$CKPT" ] || CKPT=/tmp/esc_longrun/stageC.ckpt
  timeout 3600 python tools/eval_bitrate_curve.py --ckpt "$CKPT" \
    --out /tmp/esc_longrun/bitrate_curve.json \
    > /tmp/esc_longrun/bitrate_curve.log 2>&1
  echo "curve exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 5 ]; then
  step 5 "tpu_parity green run (on-chip kernel/codec parity)"
  timeout 3600 python tools/tpu_parity.py > /tmp/r3_tpu_parity.log 2>&1
  echo "tpu_parity exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 6 ]; then
  step 6 "perf_ablation full matrix (fused/encdec rows)"
  timeout 5400 python tools/perf_ablation.py > /tmp/r3_perf_ablation.log 2>&1
  echo "perf_ablation exit=$?" | tee -a "$LOG"
fi

echo "=== r3 queue done $(date -u)" | tee -a "$LOG"
