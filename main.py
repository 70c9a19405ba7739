"""Training entry point (mirrors the reference main.py CLI).

    python main.py --config_path configs/9kbps_esc_base.yaml \
        --exp_name esc9kbps --num_epochs 80 --num_pretraining_epochs 15 \
        --dropout_rate 0.75 --seed 53

Under SPMD there is no ``accelerate launch``: one process drives all
local TPU chips through a jax.sharding Mesh (``--num_devices`` caps how
many are used; default all).
"""

import argparse

from esc_tpu.utils import read_yaml, dict2namespace


def parse_args_config():
    parser = argparse.ArgumentParser()
    # Experimental setups (same flags as the reference main.py:7-31)
    parser.add_argument("--exp_name", default="esc9kbps", type=str)
    parser.add_argument("--wandb_project", default=None, type=str)
    parser.add_argument("--lr", default=1.0e-4, type=float)
    parser.add_argument("--num_epochs", default=80, type=int)
    parser.add_argument("--num_pretraining_epochs", default=10, type=int)
    parser.add_argument("--num_devices", default=None, type=int)
    parser.add_argument("--num_warmup_steps", default=0, type=int)
    parser.add_argument("--val_metric", default="PESQ", type=str)
    parser.add_argument("--scheduler_type", default="constant", type=str)
    parser.add_argument("--dropout_rate", type=float, default=1.0)
    parser.add_argument("--adv_training", default=False, action="store_true")
    parser.add_argument("--pretrain_ckp", type=str, default=None)
    parser.add_argument("--resume", default=False, action="store_true",
                        help="auto-resume from the rolling checkpoint")
    parser.add_argument("--log_steps", default=5, type=int)
    parser.add_argument("--save_path", default="./output", type=str)
    parser.add_argument("--config_path", default="./configs/9kbps_esc_base.yaml")
    parser.add_argument("--seed", default=1234, type=int)
    args = parser.parse_args()
    config = dict2namespace(read_yaml(args.config_path))
    return args, config


def main():
    args, config = parse_args_config()
    import jax
    devices = jax.devices()
    if args.num_devices:
        devices = devices[: args.num_devices]

    if args.adv_training:
        from esc_tpu.train.trainer_adv import TrainerAdv
        trainer = TrainerAdv(config, args, devices=devices)
    else:
        from esc_tpu.train.trainer import Trainer
        trainer = Trainer(config, args, devices=devices)

    if args.wandb_project:
        try:
            import wandb
            wandb.init(project=args.wandb_project, name=args.exp_name)
            trainer.wandb = wandb
        except ImportError:
            print("wandb not installed; logging to stdout only")
    trainer.train()


if __name__ == "__main__":
    main()
