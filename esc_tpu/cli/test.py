"""Batch evaluation CLI (mirrors scripts/test.py:57-118).

    python -m esc_tpu.cli.test \
        --eval_folder_path ./eval_set --batch_size 12 \
        --model_path ./esc9kbps

Sweeps all bitrates (or one via --num_streams), writes
``{save_path}/perf_stats.json`` in the reference layout.
"""

from __future__ import annotations

import argparse
import json

from ..metrics import (PESQ, STOI, EntropyCounter,
                       MelSpectrogramDistance, SISDR)
from ..train.data import make_dataloader
from ..train.evaluate import eval_epoch
from ..utils import read_yaml
from .compress import load_model


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--eval_folder_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--model_path", type=str, required=True,
                   help="folder with model configuration and checkpoint")
    p.add_argument("--save_path", type=str, default=None,
                   help="folder to save test statistics")
    p.add_argument("--num_streams", type=int, default=None,
                   help="evaluate a single bitrate instead of the sweep")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard eval batches across all local devices")
    p.add_argument("--device", type=str, default=None,
                   help="unused (JAX selects the backend)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="compute dtype (bfloat16 = fast serving mode)")
    return p.parse_args(argv)


def run(args):
    model = load_model(args.model_path,
                       dtype=getattr(args, "dtype", "float32"))
    # pad_eval: one static padded shape + per-utterance masked metrics, so
    # unequal-length folders score identically at any batch size (nothing
    # is cropped to the batch min)
    eval_loader = make_dataloader(args.eval_folder_path, args.batch_size,
                                  shuffle=False, pad_eval=True,
                                  pad_fn=model.pad_length)
    metric_funcs = {"PESQ": PESQ(), "MelDistance": MelSpectrogramDistance(),
                    "SISDR": SISDR(), "STOI": STOI()}
    from ..metrics import HAVE_PESQ
    if not HAVE_PESQ:
        print("NOTE: PESQ scored by the in-repo NumPy P.862.2 model "
              "(esc_tpu/metrics_pesq.py) — the `pesq` C library is not "
              "installed (pip install pesq for exact published-number "
              "comparability). STOI (esc_tpu/metrics_stoi.py) is "
              "reported alongside as a second perceptual column.")
    cfg = read_yaml(f"{args.model_path}/config.yaml")
    e_counter = EntropyCounter(cfg["model"]["codebook_size"],
                               num_streams=cfg["model"]["max_streams"],
                               num_groups=cfg["model"].get("group_size", 3))
    dp = None
    if args.data_parallel:
        from ..parallel import DataParallel
        dp = DataParallel()
    performances = eval_epoch(model, eval_loader, metric_funcs, e_counter,
                              bps_per_stream=1.5,
                              num_streams=args.num_streams, verbose=True,
                              dp=dp)
    save_path = args.save_path or args.model_path
    with open(f"{save_path}/perf_stats.json", "w") as f:
        json.dump(performances, f, indent=2)
    print(f"Test statistics saved into {save_path}/perf_stats.json")


if __name__ == "__main__":
    run(parse_args())
