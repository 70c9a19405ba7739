"""Pipelined serving: overlap H2D upload, device compute, and D2H
download across a stream of requests.

The reference has no serving path beyond a synchronous loop
(reference: scripts/test.py:22-55 blocks per batch). On TPU the
roundtrip compute for ESC-Base is ~0.33 ms per batch-16 (DESIGN.md
§8b) while a dispatch+transfer round through the host costs several
times that, so a serve loop that calls ``block_until_ready`` per batch
is transfer-bound. JAX's async dispatch already forms a pipeline if the
host simply *keeps dispatching*: this module provides the bounded
in-flight window that makes that safe (backpressure) and starts result
downloads early (``copy_to_host_async``) so D2H streams while the next
batches compute.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator

import jax
import numpy as np

__all__ = ["stream_map", "stream_roundtrip"]


def _start_host_copy(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:  # non-jax leaf
            pass


def stream_map(fn: Callable[[Any], Any], inputs: Iterable[Any],
               depth: int = 2, to_host: bool = True) -> Iterator[Any]:
    """Map ``fn`` (a jitted device function) over ``inputs`` with up to
    ``depth`` batches in flight.

    Dispatch for batch ``i+1..i+depth`` overlaps the device compute and
    the D2H download of batch ``i``. ``depth=1`` degenerates to the
    serial loop. With ``to_host`` the yielded values are numpy trees
    (downloads begin as soon as each batch is dispatched); otherwise
    device arrays are yielded without any host sync.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    inflight: deque = deque()
    for batch in inputs:
        out = fn(batch)
        if to_host:
            _start_host_copy(out)
        inflight.append(out)
        if len(inflight) >= depth:
            yield _finish(inflight.popleft(), to_host)
    while inflight:
        yield _finish(inflight.popleft(), to_host)


def _finish(out, to_host: bool):
    if to_host:
        return jax.tree_util.tree_map(np.asarray, out)
    return out


def stream_roundtrip(model, batches: Iterable[np.ndarray],
                     num_streams: int = 6, depth: int = 2,
                     to_host: bool = True) -> Iterator[Any]:
    """Pipelined encode+decode over a stream of ``(B, L)`` host batches.

    Yields ``(codes, recon)`` per input batch, in order, with ``depth``
    batches in flight (see :func:`stream_map`).
    """
    def fn(x):
        codes, _, recon = model.roundtrip(x, num_streams=num_streams)
        return codes, recon

    return stream_map(fn, batches, depth=depth, to_host=to_host)
