"""Codec round-trip CLI (mirrors scripts/compress.py).

    python -m esc_tpu.cli.compress \
        --input audio.wav --save_path ./output \
        --model_path ./esc9kbps --num_streams 6

Artifacts: ``decoded_{kbps}kbps_{name}.wav`` plus the code tensor saved
both as ``encoded_{kbps}kbps_{name}.npy`` and — improving on the
reference's raw ``torch.save`` dump (compress.py:35, no bit-packing) —
an actually-compressed ``.escb`` bitstream at the nominal bitrate
(:mod:`esc_tpu.cli.bitstream`).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..convert import load_torch_checkpoint
from ..checkpoint import load_checkpoint
from ..models import make_model
from ..train.data import load_wav, save_wav
from ..utils import read_yaml, to_host
from .bitstream import pack_codes


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", type=str, required=True,
                   help="input 16kHz mono audio file to encode")
    p.add_argument("--save_path", type=str, default="./output",
                   help="folder to save codes and reconstructed audio")
    p.add_argument("--model_path", type=str, required=True,
                   help="folder with config.yaml and model checkpoint")
    p.add_argument("--num_streams", type=int, default=6,
                   help="number of transmitted streams in encoding")
    p.add_argument("--chunk_seconds", type=float, default=None,
                   help="constant-memory chunked inference for long "
                        "files (window-grid-aligned chunks + margins)")
    p.add_argument("--device", type=str, default=None,
                   help="unused (JAX selects the backend); kept for "
                        "reference CLI compatibility")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="compute dtype; bfloat16 is the fast serving "
                        "mode (params stay float32, matmuls run bf16 "
                        "on the MXU)")
    return p.parse_args(argv)


def load_model(model_path: str, seed: int = 0, dtype: str = "float32"):
    """Build a codec from ``{model_path}/config.yaml`` and load weights
    from ``model.pth`` (reference torch) / ``model.ckpt`` (ours) /
    ``best.ckpt`` / ``checkpoint.ckpt`` — whichever exists."""
    import jax.numpy as jnp

    cfg = read_yaml(os.path.join(model_path, "config.yaml"))
    jdtype = {"float32": jnp.float32,
              "bfloat16": jnp.bfloat16}[dtype] if isinstance(dtype, str) \
        else dtype
    model = make_model(cfg["model"], cfg.get("model_name", "csvq+swinT"),
                       seed=seed, dtype=jdtype)
    model.init_params()
    for cand in ("model.pth", "best.pth", "model.ckpt", "best.ckpt",
                 "checkpoint.ckpt", "pretrained.ckpt"):
        path = os.path.join(model_path, cand)
        if os.path.exists(path):
            if cand.endswith(".pth"):
                load_torch_checkpoint(path, model)
            else:
                payload = load_checkpoint(path)
                from flax import serialization
                model.variables = {"params": serialization.from_state_dict(
                    model.variables["params"], payload["model_state_dict"])}
            print(f"loaded weights from {path}")
            return model
    print(f"WARNING: no checkpoint found under {model_path}; "
          f"using random initialization")
    return model


def main(args):
    x = load_wav(args.input)[None, :]
    model = load_model(args.model_path,
                       dtype=getattr(args, "dtype", "float32"))

    if args.chunk_seconds:
        codes, feat_shape = model.encode_chunked(
            x, num_streams=args.num_streams,
            chunk_seconds=args.chunk_seconds)
        recon = model.decode_chunked(codes, feat_shape,
                                     chunk_seconds=args.chunk_seconds)
    else:
        # fused single-dispatch encode+decode
        codes, feat_shape, recon = model.roundtrip(
            x, num_streams=args.num_streams)

    fname = os.path.basename(args.input)
    stem = fname.rsplit(".", 1)[0]
    kbps = args.num_streams * 1.5
    os.makedirs(args.save_path, exist_ok=True)
    save_wav(os.path.join(args.save_path, f"decoded_{kbps}kbps_{fname}"),
             to_host(recon)[0])
    np.save(os.path.join(args.save_path, f"encoded_{kbps}kbps_{stem}.npy"),
            to_host(codes))
    blob = pack_codes(to_host(codes), model.config["codebook_size"],
                      feat_shape)
    with open(os.path.join(args.save_path,
                           f"encoded_{kbps}kbps_{stem}.escb"), "wb") as f:
        f.write(blob)
    print(f"compression outputs saved into {args.save_path}")


if __name__ == "__main__":
    main(parse_args())
