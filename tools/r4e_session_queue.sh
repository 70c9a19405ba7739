#!/bin/bash
# r4e serial chip queue: adversarial finetune of the best speech-corpus
# checkpoint (speechB) with the reference GAN recipe, then the post-GAN
# s=1..6 ladder — evidence that the adversarial stage preserves the full
# bitrate ladder on a well-trained codec (the prior GAN artifact was a
# 350-step stability run from a lightly-trained init).
set -u
cd /root/repo
ART=/root/repo/artifacts
LOG=/tmp/r4e_queue.log
mkdir -p /tmp/esc_longrun
START="${1:-1}"

step() { echo "--- step $1: $2 $(date -u)" | tee -a "$LOG"; }
echo "=== r4e queue starting at step $START $(date -u)" | tee -a "$LOG"

if [ "$START" -le 1 ]; then
  step 1 "speechAdv: 4k adversarial steps from speechB (lr/10 post-adv recipe)"
  timeout 7200 python tools/adv_trajectory.py \
    --pretrain-steps 0 --adv-steps 4000 --eval-every 500 --lr 1e-5 \
    --dropout-rate 0.75 --corpus speechlike \
    --init-ckpt /root/repo/artifacts/speechB.ckpt \
    --save-ckpt /tmp/esc_longrun/speechAdv.ckpt \
    --out "$ART/speechAdv.json" \
    > /tmp/esc_longrun/speechAdv.log 2>&1
  echo "speechAdv exit=$?" | tee -a "$LOG"
  [ -f /tmp/esc_longrun/speechAdv.ckpt ] && \
    cp /tmp/esc_longrun/speechAdv.ckpt "$ART/speechAdv.ckpt"
fi

if [ "$START" -le 2 ] && [ -f /tmp/esc_longrun/speechAdv.ckpt ]; then
  step 2 "post-GAN bitrate ladder on speechAdv"
  timeout 3600 python tools/eval_bitrate_curve.py \
    --ckpt /tmp/esc_longrun/speechAdv.ckpt --corpus speechlike \
    --out "$ART/bitrate_curve_speechAdv.json" \
    > /tmp/r4e_curve_adv.log 2>&1
  echo "adv curve exit=$?" | tee -a "$LOG"
fi

echo "=== r4e queue done $(date -u)" | tee -a "$LOG"
