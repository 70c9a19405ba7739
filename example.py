"""Programmatic demo (mirrors the reference example.ipynb):

load a config + checkpoint, encode/decode at 9 kbps, report the codes
shape, nominal bitrate, and quality metrics, and (with --plot) save a
mel-spectrogram comparison figure like the notebook's cells 3-7.

    python example.py --model_path ./esc9kbps --input audio.wav \
        --plot melcomp.png
"""

import argparse

import numpy as np


def plot_mel_comparison(x, recon, out_path, sample_rate=16000):
    """Two-panel mel-dB comparison (reference example.ipynb: librosa
    melspectrogram n_mels=256 + specshow). Uses the in-repo DFT-as-GEMM
    mel op; matplotlib is an optional import."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not installed — skipping --plot")
        return False
    from esc_tpu.ops.mel import mel_spectrogram

    mels = []
    for sig in (x, recon):
        m = np.asarray(mel_spectrogram(np.asarray(sig, np.float32),
                                       n_fft=2048, n_mels=256,
                                       sample_rate=sample_rate))[0]
        mels.append(20.0 * np.log10(np.maximum(m, 1e-10)))
    vmax = max(m.max() for m in mels)
    vmin = vmax - 80.0
    fig, axes = plt.subplots(2, 1, figsize=(10, 7), sharex=True)
    hop = 2048 // 4
    extent = [0, mels[0].shape[1] * hop / sample_rate, 0, 256]
    for ax, m, title in zip(axes, mels, ("input", "reconstruction")):
        im = ax.imshow(m, origin="lower", aspect="auto", cmap="magma",
                       vmin=vmin, vmax=vmax, extent=extent)
        ax.set_title(title)
        ax.set_ylabel("mel bin")
    axes[1].set_xlabel("time (s)")
    fig.colorbar(im, ax=axes, format="%+2.0f dB")
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    print(f"mel comparison written to {out_path}")
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default=None,
                   help="folder with config.yaml (+ checkpoint); default "
                        "builds a random-init ESC-Base")
    p.add_argument("--input", type=str, default=None,
                   help="16 kHz mono wav; default synthesizes a test tone")
    p.add_argument("--num_streams", type=int, default=6)
    p.add_argument("--plot", type=str, default=None,
                   help="write a mel-spectrogram comparison PNG here")
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
    from esc_tpu.utils import to_host
    recon = to_host(model.decode(codes, shape))

    kbps = args.num_streams * 1.5
    print(f"codes: {codes.shape} int10 @ {kbps:.1f} kbps "
          f"(feat_shape={shape})")
    print(f"recon: {recon.shape}")
    print(f"Mel-Distance: {MelSpectrogramDistance()(x, recon)[0]:.4f}")
    print(f"SI-SDR:       {SISDR()(x, recon)[0]:.4f} dB")
    pesq = PESQ()(x, recon)[0]
    print(f"PESQ(wb):     {pesq:.4f}" if np.isfinite(pesq)
          else "PESQ(wb):     n/a (pesq C library not installed)")

    if args.plot:
        plot_mel_comparison(x, recon, args.plot)


if __name__ == "__main__":
    main()
