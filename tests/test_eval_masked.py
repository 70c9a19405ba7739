"""Honest batched eval: pad+mask metrics are per-utterance exact and
batch-size independent (VERDICT round-1 item 6).

The eval collate pads every utterance to one static dataset-wide length
and metrics mask to each true length, so evaluating an unequal-length
folder gives identical numbers at batch_size 1 and 8 — unlike the
reference, whose default collate cannot batch unequal lengths at all
(scripts/test.py:22-55 assumes equal-length clips).
"""

import numpy as np
import pytest

from esc_tpu.metrics import (EntropyCounter, MelSpectrogramDistance, SISDR,
                             mel_distance, mel_distance_masked, sisdr,
                             sisdr_masked)
from esc_tpu.models import make_model
from esc_tpu.train.data import make_dataloader, save_wav
from esc_tpu.train.evaluate import eval_epoch
from tests.test_model_shapes import TINY_CONFIG

LENGTHS = [7919, 5000, 6481, 4000]  # unequal, not hop-aligned


def test_masked_metrics_match_unpadded(rng):
    L = 8000
    x = rng.standard_normal((len(LENGTHS), L)).astype(np.float32)
    y = (x + 0.1 * rng.standard_normal((len(LENGTHS), L))).astype(np.float32)
    for b, n in enumerate(LENGTHS):
        x[b, n:] = 0.0
        y[b, n:] = 0.0
    lengths = np.asarray(LENGTHS, np.int32)

    got_mel = np.asarray(mel_distance_masked(x, y, lengths))
    got_sdr = np.asarray(sisdr_masked(x, y, lengths))
    for b, n in enumerate(LENGTHS):
        want_mel = np.asarray(mel_distance(x[b : b + 1, :n], y[b : b + 1, :n]))
        want_sdr = np.asarray(sisdr(x[b : b + 1, :n], y[b : b + 1, :n]))
        np.testing.assert_allclose(got_mel[b], want_mel[0], rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(got_sdr[b], want_sdr[0], rtol=1e-4,
                                   atol=1e-4)


def test_entropy_counter_masks_padding(rng):
    codes = rng.integers(0, 64, size=(2, 2, 3, 10))
    full = EntropyCounter(64, num_streams=2, num_groups=3)
    full.update(codes)
    masked = EntropyCounter(64, num_streams=2, num_groups=3)
    # lengths cover only 4 and 7 of the 10 code frames (320 samples/code)
    masked.update(codes, lengths=np.asarray([4 * 320, 7 * 320 - 1]),
                  samples_per_code=320)
    assert masked.total_counts == 4 + 7
    want = sum(np.bincount(codes[b, 0, 0, :n], minlength=64)
               for b, n in ((0, 4), (1, 7)))
    np.testing.assert_array_equal(masked.counts[0, 0], want)
    assert full.total_counts == 20


@pytest.fixture(scope="module")
def wav_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("uneq_wavs")
    rng = np.random.default_rng(7)
    for i, n in enumerate(LENGTHS):
        # EvalSet trims the trailing 80 samples, so write n + 80
        save_wav(str(folder / f"clip{i}.wav"),
                 0.2 * rng.standard_normal(n + 80).astype(np.float32))
    return str(folder)


def test_eval_batch_size_independent(wav_folder):
    model = make_model(TINY_CONFIG, "csvq+swinT")
    model.init_params(example_len=7920)
    metrics = {"MelDistance": MelSpectrogramDistance(), "SISDR": SISDR()}

    def run(bs):
        loader = make_dataloader(wav_folder, bs, shuffle=False,
                                 pad_eval=True)
        ec = EntropyCounter(TINY_CONFIG["codebook_size"], 6, 3)
        return eval_epoch(model, loader, metrics, ec, num_streams=2,
                          verbose=False)

    p1, p4 = run(1), run(4)
    assert p1 == p4, (p1, p4)
    assert all(np.isfinite(v) for vals in p1.values() for v in vals)


def test_padded_loader_keeps_all_utterances(wav_folder):
    # batch_size 3 over 4 files: no drop_last in eval mode — the final
    # partial batch is padded with zero-length rows
    loader = make_dataloader(wav_folder, 3, shuffle=False, pad_eval=True)
    seen = []
    for x, lengths in loader:
        assert x.shape[0] == 3 and x.shape[1] % 80 == 0
        seen.extend(lengths.tolist())
    assert sorted(n for n in seen if n > 0) == sorted(LENGTHS)
