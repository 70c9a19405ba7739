"""Checkpointing: msgpack trees with the reference's dict layout.

The reference saves a single ``torch.save`` dict with keys ``step``,
``model_state_dict``, ``optimizer_state_dict``, ``scheduler_state_dict``,
``best_perf`` (scripts/trainer_no_adv.py:152-162; the adversarial trainer
adds ``model_disc_state_dict`` / ``optimizer_disc_state_dict``,
scripts/trainer_adv.py:160-172). We keep the same top-level keys with
flax/optax pytrees as values, serialized with flax msgpack — a single
portable file per tag (pretrained / best / checkpoint), written by
process 0 only.

Reference ``.pth`` checkpoints load through
:func:`esc_tpu.convert.load_torch_checkpoint`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "restore_into"]


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(save_path: str, tag: str, *, step: int,
                    model_state: Any, optimizer_state: Any = None,
                    scheduler_state: Optional[Dict] = None,
                    best_perf: float = -1.0, extra: Optional[Dict] = None
                    ) -> str:
    """Write a checkpoint file ``{save_path}/{tag}`` (e.g. best.ckpt)."""
    if jax.process_index() != 0:
        return os.path.join(save_path, tag)
    os.makedirs(save_path, exist_ok=True)
    payload = {
        "step": step,
        "model_state_dict": _to_numpy(model_state),
        "optimizer_state_dict": _to_numpy(optimizer_state)
        if optimizer_state is not None else {},
        "scheduler_state_dict": scheduler_state or {},
        "best_perf": float(best_perf),
    }
    if extra:
        payload.update(_to_numpy(extra))
    path = os.path.join(save_path, tag)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Read a raw checkpoint payload (structure-free msgpack tree)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(path: str, model_state_target: Any,
                 optimizer_state_target: Any = None) -> Dict[str, Any]:
    """Load a checkpoint and restore pytrees against target structures
    (shapes/dtypes validated by flax ``from_state_dict`` semantics)."""
    payload = load_checkpoint(path)
    out = dict(payload)
    out["model_state_dict"] = serialization.from_state_dict(
        model_state_target, payload["model_state_dict"])
    if optimizer_state_target is not None and payload.get(
            "optimizer_state_dict"):
        out["optimizer_state_dict"] = serialization.from_state_dict(
            optimizer_state_target, payload["optimizer_state_dict"])
    return out
