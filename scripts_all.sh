#!/usr/bin/env bash
# Experiment recipes (mirrors the reference scripts_all.sh): every paper
# run, launched as single-process SPMD over all local TPU chips.
# Common flags: lr 1e-4, dropout 0.75, seed 53.
set -e

# ---- ESC-Base (non-adversarial), 80 epochs, 15 pretraining ----
python main.py --config_path configs/9kbps_esc_base.yaml \
    --exp_name esc9kbps_base --lr 1.e-4 --num_epochs 80 \
    --num_pretraining_epochs 15 --dropout_rate 0.75 --seed 53

# ---- ESC-Base adversarial, 50 epochs, 5 pretraining ----
python main.py --config_path configs/9kbps_esc_base_adv.yaml --adv_training \
    --exp_name esc9kbps_base_adv --lr 1.e-4 --num_epochs 50 \
    --num_pretraining_epochs 5 --dropout_rate 0.75 --seed 53

# ---- ESC-Base post-adversarial finetune (lr/10 automatic) ----
python main.py --config_path configs/9kbps_esc_base_adv.yaml --adv_training \
    --exp_name esc9kbps_base_postadv --lr 1.e-4 --num_epochs 20 \
    --num_pretraining_epochs 0 --dropout_rate 0.75 --seed 53 \
    --pretrain_ckp output/esc9kbps_base/best.ckpt

# ---- ESC-Large ----
python main.py --config_path configs/9kbps_esc_large.yaml \
    --exp_name esc9kbps_large --lr 1.e-4 --num_epochs 80 \
    --num_pretraining_epochs 15 --dropout_rate 0.75 --seed 53

# ---- Ablations (50 epochs, no pretraining) ----
for abl in csvq_swinT csvq_conv rvq_swinT rvq_conv; do
python main.py --config_path configs/ablations/9kbps_${abl}.yaml \
    --exp_name 9kbps_${abl} --lr 1.e-4 --num_epochs 50 \
    --num_pretraining_epochs 0 --dropout_rate 0.75 --seed 53
done

# ---- DAC baselines on DNS ----
python -c "
from esc_tpu.baselines.dac.trainer import DACTrainer
import yaml
cfg = yaml.safe_load(open('configs/dac/16khz_dns_9k.yml'))
DACTrainer(cfg, adversarial=True).train()
"
python -c "
from esc_tpu.baselines.dac.trainer import DACTrainer
import yaml
cfg = yaml.safe_load(open('configs/dac/16khz_dns_9k_tiny.yml'))
DACTrainer(cfg, adversarial=False).train()
"

# ---- Evaluation sweeps ----
python -m esc_tpu.cli.test --eval_folder_path ./data/eval \
    --batch_size 12 --model_path output/esc9kbps_base
