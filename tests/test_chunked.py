"""Chunked constant-memory ESC inference (capability extension; the
reference only chunks DAC): interior codes must match full-file
encoding, and the spliced waveform must stay close to the full decode.
"""

import numpy as np

from esc_tpu.models import make_model
from esc_tpu.metrics import sisdr
from tests.test_model_shapes import TINY_CONFIG

def test_chunked_encode_decode(rng):
    model = make_model(TINY_CONFIG, "csvq+swinT")
    model.init_params(example_len=7920)
    L = 2 * 47920 + 80  # ~6 s -> T=1200 STFT frames, 300 code frames
    x = (0.2 * rng.standard_normal((1, L))).astype(np.float32)

    full_codes, fs = model.encode(x, num_streams=3)
    ck_codes, ck_fs = model.encode_chunked(x, num_streams=3,
                                           chunk_seconds=2.0,
                                           margin_seconds=0.5)
    assert ck_fs == fs
    assert ck_codes.shape == full_codes.shape
    agree = (np.asarray(ck_codes) == np.asarray(full_codes)).mean()
    assert agree > 0.95, f"chunked/full code agreement {agree:.3f}"

    full_audio = np.asarray(model.decode(full_codes, fs))
    ck_audio = np.asarray(model.decode_chunked(ck_codes, ck_fs,
                                               chunk_seconds=2.0,
                                               margin_seconds=0.5))
    assert ck_audio.shape == full_audio.shape
    # the last ~0.5 s reflects tail zero-padding (the only codes allowed
    # to differ); judge seam quality on the interior
    quality = float(np.asarray(sisdr(full_audio[:, :-8000],
                                     ck_audio[:, :-8000]))[0])
    assert quality > 25.0, f"chunked-vs-full SISDR {quality:.1f} dB"
