"""EnCodec comparison wrapper (mirrors dac/compare/encodec.py).

The reference wraps Facebook's ``encodec`` pip package purely for
benchmark comparisons. That package (and network access to fetch its
weights) is not available in this image, so this wrapper is gated: it
exposes the same interface and raises a clear error at construction
unless ``encodec`` is importable.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Encodec"]


class Encodec:
    """Comparison-only EnCodec wrapper (24 kHz model, bandwidth in kbps)."""

    def __init__(self, bandwidth: float = 6.0):
        try:
            import encodec  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "EnCodec comparisons need the `encodec` pip package, which "
                "is not bundled with esc_tpu (and this environment has no "
                "network egress). Install it to enable this wrapper."
            ) from e
        import torch
        from encodec import EncodecModel

        self.model = EncodecModel.encodec_model_24khz()
        self.model.set_target_bandwidth(bandwidth)
        self._torch = torch

    def __call__(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        torch = self._torch
        x = torch.as_tensor(audio, dtype=torch.float32)
        if x.ndim == 2:
            x = x[:, None, :]
        with torch.no_grad():
            frames = self.model.encode(x)
            out = self.model.decode(frames)
        return out[:, 0].numpy()
