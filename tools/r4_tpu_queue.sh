#!/bin/bash
# Round-4 TPU queue, highest-leverage first (VERDICT r3 "Next round").
# Serial on purpose: concurrent TPU jobs serialize on the chip and the
# second one looks hung (.claude/skills/verify/SKILL.md). Each step is
# individually bounded by timeout and logs to /tmp; durable outputs are
# copied into artifacts/ so the round-end driver commit preserves them.
#
# Usage: bash tools/r4_tpu_queue.sh [start_step]
set -u
cd /root/repo
START=${1:-1}
LOG=/tmp/r4_queue.log
ART=/root/repo/artifacts
mkdir -p "$ART" /tmp/esc_longrun
echo "=== r4 queue starting at step $START $(date -u)" | tee -a "$LOG"

step() { echo "--- step $1: $2 $(date -u)" | tee -a "$LOG"; }

if [ "$START" -le 1 ]; then
  step 1 "bench.py -> the BENCH_r04 headline record (fetch-verified)"
  timeout 2400 python bench.py > /tmp/r4_bench.log 2>&1
  echo "bench exit=$? tail: $(tail -1 /tmp/r4_bench.log)" | tee -a "$LOG"
  grep '^{' /tmp/r4_bench.log | tail -1 > "$ART/bench_r4_headline.json" || true
fi

if [ "$START" -le 2 ]; then
  step 2 "bench_all -> regenerate BENCH_EXTRA.json (was deleted as stale)"
  timeout 5400 python bench_all.py > /tmp/r4_bench_all.log 2>&1
  echo "bench_all exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 3 ]; then
  step 3 "tpu_parity green run (post-tie-break-fix on-chip validation)"
  timeout 3600 python tools/tpu_parity.py > /tmp/r4_tpu_parity.log 2>&1
  rc=$?
  echo "tpu_parity exit=$rc" | tee -a "$LOG"
  tail -3 /tmp/r4_tpu_parity.log | tee -a "$LOG"
fi

if [ "$START" -le 4 ]; then
  step 4 "stageD: +20k steps from stageC, SAVE ckpt (toward the 8.3 dB bar)"
  timeout 14400 python tools/quality_longrun.py --steps 20000 \
    --pretrain-steps 0 --scan 500 --eval-every 2500 --lr 1e-4 \
    --mode scan --init-ckpt /tmp/esc_longrun/stageC.ckpt \
    --save-ckpt /tmp/esc_longrun/stageD.ckpt \
    --out "$ART/stageD.json" \
    > /tmp/esc_longrun/stageD.log 2>&1
  echo "stageD exit=$?" | tee -a "$LOG"
  [ -f /tmp/esc_longrun/stageD.ckpt ] && \
    cp /tmp/esc_longrun/stageD.ckpt "$ART/stageD.ckpt"
fi

if [ "$START" -le 5 ]; then
  step 5 "bitrate curve on best ckpt (harmonic corpus, committed artifact)"
  CKPT="$ART/stageD.ckpt"
  [ -f "$CKPT" ] || CKPT="$ART/stageC.ckpt"
  timeout 3600 python tools/eval_bitrate_curve.py --ckpt "$CKPT" \
    --out "$ART/bitrate_curve_best.json" \
    > /tmp/r4_curve.log 2>&1
  echo "curve exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 6 ]; then
  step 6 "nsRescue: +10k steps from stageC at dropout 1.0 (tests the cliff diagnosis cheaply)"
  timeout 7200 python tools/quality_longrun.py --steps 10000 \
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
fi

if [ "$START" -le 7 ]; then
  step 7 "speechlike stageA: 40k steps from scratch on the transient-anchored corpus"
  timeout 28800 python tools/quality_longrun.py --steps 40000 \
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

if [ "$START" -le 8 ]; then
  step 8 "armHigh: 10k steps at matmul precision=high from stageC (A/B vs highest/default)"
  JAX_DEFAULT_MATMUL_PRECISION=high timeout 7200 \
    python tools/quality_longrun.py --steps 10000 --pretrain-steps 0 \
    --scan 500 --eval-every 2500 --lr 1e-4 --mode scan \
    --init-ckpt /tmp/esc_longrun/stageC.ckpt \
    --out "$ART/armHigh.json" \
    > /tmp/esc_longrun/armHigh.log 2>&1
  echo "armHigh exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 9 ]; then
  step 9 "armEncDefault: 10k steps, encoder-only MXU-default matmuls from stageC"
  timeout 7200 python tools/quality_longrun.py --steps 10000 \
    --pretrain-steps 0 --scan 500 --eval-every 2500 --lr 1e-4 \
    --mode scan --enc-precision default \
    --init-ckpt /tmp/esc_longrun/stageC.ckpt \
    --out "$ART/armEncDefault.json" \
    > /tmp/esc_longrun/armEncDefault.log 2>&1
  echo "armEncDefault exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 10 ]; then
  step 10 "perf_ablation full matrix (fused/encdec rows, MFU estimate)"
  timeout 5400 python tools/perf_ablation.py > /tmp/r4_perf_ablation.log 2>&1
  echo "perf_ablation exit=$?" | tee -a "$LOG"
fi

if [ "$START" -le 11 ]; then
  step 11 "adv stage: 5k adversarial steps from best ckpt (paper: +1.8 dB over non-adv), batch 4"
  CKPT=/tmp/esc_longrun/stageD.ckpt
  [ -f "$CKPT" ] || CKPT=/tmp/esc_longrun/stageC.ckpt
  timeout 14400 python tools/adv_trajectory.py --pretrain-steps 0 \
    --adv-steps 5000 --eval-every 500 --lr 1e-4 --batch-size 4 \
    --init-ckpt "$CKPT" \
    --save-ckpt /tmp/esc_longrun/stageAdv.ckpt \
    --out "$ART/stageAdv.json" \
    > /tmp/esc_longrun/stageAdv.log 2>&1
  echo "adv stage exit=$?" | tee -a "$LOG"
  [ -f /tmp/esc_longrun/stageAdv.ckpt ] && \
    cp /tmp/esc_longrun/stageAdv.ckpt "$ART/stageAdv.ckpt"
fi

echo "=== r4 queue done $(date -u)" | tee -a "$LOG"
