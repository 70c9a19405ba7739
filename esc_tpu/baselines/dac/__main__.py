"""DAC CLI: encode / decode (mirrors dac/__main__.py:9-36).

    python -m esc_tpu.baselines.dac encode in.wav --output out.dac \
        --model_path ./dac_ckpt [--n_quantizers 9]
    python -m esc_tpu.baselines.dac decode out.dac --output recon.wav \
        --model_path ./dac_ckpt
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_model(model_path: str | None, config_path: str | None):
    import yaml

    from .model import DAC

    cfg = {"sample_rate": 16000, "encoder_dim": 64,
           "encoder_rates": [2, 4, 5, 8], "decoder_dim": 1536,
           "decoder_rates": [8, 5, 4, 2], "n_codebooks": 18,
           "codebook_size": 1024, "codebook_dim": 8,
           "quantizer_dropout": 0.5}
    if config_path:
        with open(config_path) as f:
            cfg = yaml.safe_load(f)["DAC"]
    model = DAC(**cfg)
    model.init_params()
    if model_path:
        from flax import serialization

        from ...checkpoint import load_checkpoint
        for cand in ("best.ckpt", "latest.ckpt", "model.ckpt"):
            p = os.path.join(model_path, cand)
            if os.path.exists(p):
                payload = load_checkpoint(p)
                model.variables = {"params": serialization.from_state_dict(
                    model.variables["params"], payload["model_state_dict"])}
                print(f"loaded {p}")
                break
        else:
            print(f"WARNING: no checkpoint under {model_path}; random init")
    return model


def main():
    p = argparse.ArgumentParser(prog="esc_tpu.baselines.dac")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("encode", "decode"):
        s = sub.add_parser(name)
        s.add_argument("input")
        s.add_argument("--output", required=True)
        s.add_argument("--model_path", default=None)
        s.add_argument("--config", default=None)
        if name == "encode":
            s.add_argument("--n_quantizers", type=int, default=None)
            s.add_argument("--win_duration", type=float, default=1.0)
    args = p.parse_args()

    model = build_model(args.model_path, args.config)
    if args.cmd == "encode":
        f = model.compress(args.input, win_duration=args.win_duration,
                           n_quantizers=args.n_quantizers)
        path = f.save(args.output)
        kbps = (f.codes.shape[1] * np.log2(model.config["codebook_size"])
                * model.sample_rate / model.hop_length / 1000)
        print(f"encoded -> {path} ({kbps:.2f} kbps)")
    else:
        y = model.decompress(args.input)
        from ...train.data import save_wav
        save_wav(args.output, y[0], model.sample_rate)
        print(f"decoded -> {args.output}")


if __name__ == "__main__":
    main()
