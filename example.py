"""Programmatic demo (mirrors the reference example.ipynb):

load a config + checkpoint, encode/decode at 9 kbps, report the codes
shape, nominal bitrate, and quality metrics.

    python example.py --model_path ./esc9kbps --input audio.wav
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default=None,
                   help="folder with config.yaml (+ checkpoint); default "
                        "builds a random-init ESC-Base")
    p.add_argument("--input", type=str, default=None,
                   help="16 kHz mono wav; default synthesizes a test tone")
    p.add_argument("--num_streams", type=int, default=6)
    args = p.parse_args()

    from esc_tpu.metrics import PESQ, MelSpectrogramDistance, SISDR
    from esc_tpu.train.data import load_wav

    if args.model_path:
        from esc_tpu.cli.compress import load_model
        model = load_model(args.model_path)
    else:
        from esc_tpu.models import ESC
        from esc_tpu.utils import read_yaml
        cfg = read_yaml("configs/9kbps_esc_base.yaml")["model"]
        model = ESC(**cfg)
        print("using random-init ESC-Base (pass --model_path for a "
              "trained codec)")

    if args.input:
        x = load_wav(args.input)
        x = x[: (len(x) - len(x) % 160) - 80][None]
    else:
        t = np.arange(47920) / 16000
        x = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)[None]

    codes, shape = model.encode(x, num_streams=args.num_streams)
    recon = np.asarray(model.decode(codes, shape))

    kbps = args.num_streams * 1.5
    print(f"codes: {codes.shape} int10 @ {kbps:.1f} kbps "
          f"(feat_shape={shape})")
    print(f"recon: {recon.shape}")
    print(f"Mel-Distance: {MelSpectrogramDistance()(x, recon)[0]:.4f}")
    print(f"SI-SDR:       {SISDR()(x, recon)[0]:.4f} dB")
    pesq = PESQ()(x, recon)[0]
    print(f"PESQ(wb):     {pesq:.4f}" if np.isfinite(pesq)
          else "PESQ(wb):     n/a (pesq C library not installed)")


if __name__ == "__main__":
    main()
