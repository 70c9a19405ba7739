"""Data pipeline: wav folder datasets with background prefetch.

Mirrors scripts/utils.py:27-46 (``EvalSet``: glob one or two levels of
``*.wav``, cap 180k files, drop the last 80 samples of every clip) with
a TPU-shaped loader: numpy batches assembled on host threads, prefetched
ahead of the device so input never stalls the step.

WAV decoding prefers the native C++ loader (esc_tpu/native) when built
and falls back to a pure-python PCM16 reader (stdlib ``wave``).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
import wave
from typing import Iterator, List, Optional

import numpy as np

__all__ = ["load_wav", "save_wav", "EvalSet", "make_dataloader",
           "quantization_dropout"]


def _load_wav_python(path: str) -> np.ndarray:
    """Read a PCM16/PCM32/float32 WAV as float32 in [-1, 1], first channel."""
    with wave.open(path, "rb") as f:
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch)[:, 0].copy()
    return x


def load_wav(path: str) -> np.ndarray:
    """float32 mono waveform (first channel), native loader if available."""
    try:
        from ..native import wavio
        return wavio.load_wav(path)
    except Exception:
        return _load_wav_python(path)


def save_wav(path: str, x: np.ndarray, sr: int = 16000) -> None:
    """Write float32 [-1, 1] mono audio as PCM16 WAV."""
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def quantization_dropout(dropout_rate: float, max_streams: int,
                         rng: Optional[np.random.Generator] = None) -> int:
    """Sample the per-batch number of streams (scripts/utils.py:11-25):
    with prob ``dropout_rate`` uniform in {1..max_streams}, else max."""
    assert 0 <= dropout_rate <= 1, "dropout_rate must be within [0, 1]"
    rng = rng or np.random.default_rng()
    if rng.random() < dropout_rate:
        return int(rng.integers(1, max_streams + 1))
    return max_streams


class EvalSet:
    """Wav-folder dataset (scripts/utils.py:27-40): one- or two-level
    glob, capped at 180k files, last 80 samples trimmed."""

    def __init__(self, folder: str):
        files = sorted(glob.glob(os.path.join(folder, "*.wav")))
        if not files:
            files = sorted(glob.glob(os.path.join(folder, "*", "*.wav")))
        self.files: List[str] = files[:180000]
        if not self.files:
            raise FileNotFoundError(f"no .wav files under {folder}")

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> np.ndarray:
        return load_wav(self.files[i])[:-80]


class _Prefetcher:
    """Thread-pool batch assembler with a bounded prefetch queue."""

    def __init__(self, dataset, order, batch_size, num_workers, prefetch=4):
        self.ds, self.order, self.bs = dataset, order, batch_size
        self.q: "queue.Queue" = queue.Queue(maxsize=max(2, prefetch))
        self.n_batches = len(order) // batch_size
        self.workers = max(1, num_workers)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _load_batch(self, idxs):
        items = [self.ds[i] for i in idxs]
        L = min(len(a) for a in items)
        return np.stack([a[:L] for a in items]).astype(np.float32)

    def _run(self):
        try:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(self.workers) as pool:
                futs = []
                for b in range(self.n_batches):
                    idxs = self.order[b * self.bs : (b + 1) * self.bs]
                    futs.append(pool.submit(self._load_batch, idxs))
                    while len(futs) > self.workers:
                        self.q.put(futs.pop(0).result())
                for f in futs:
                    self.q.put(f.result())
        finally:
            self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item


class DataLoader:
    """Minimal epoch-iterable loader over an EvalSet-style dataset.

    The shuffle order is a pure function of ``(seed, epoch)`` (the
    ``set_epoch`` pattern of torch's DistributedSampler): a resumed run
    that calls :meth:`set_epoch` replays exactly the order an
    uninterrupted run would have seen — preemption-safe data order,
    which the reference's DataLoader does not provide.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 0, seed: int = 0, drop_last: bool = True):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = num_workers
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.ds) // self.bs

    def __iter__(self) -> Iterator[np.ndarray]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
            self.epoch += 1  # auto-advance for plain `for epoch in ...` use
        return iter(_Prefetcher(self.ds, order, self.bs, self.workers))


def make_dataloader(data_path: str, batch_size: int, shuffle: bool,
                    num_workers: int = 0, seed: int = 0) -> DataLoader:
    """Mirror of scripts/utils.py:42-46."""
    return DataLoader(EvalSet(data_path), batch_size, shuffle, num_workers,
                      seed)
