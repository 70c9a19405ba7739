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


def _to_serializable(tree):
    """Optax optimizer states are pytrees of namedtuples; flax
    ``to_state_dict`` flattens them into plain nested dicts that msgpack
    can encode (restored against a live target with ``from_state_dict``).
    """
    return _to_numpy(serialization.to_state_dict(tree))


def save_checkpoint(save_path: str, tag: str, *, step: int,
                    model_state: Any, optimizer_state: Any = None,
                    scheduler_state: Optional[Dict] = None,
                    best_perf: float = -1.0, rng_state: Optional[str] = None,
                    extra: Optional[Dict] = None) -> str:
    """Write a checkpoint file ``{save_path}/{tag}`` (e.g. best.ckpt).

    Keeps the reference's full-state dict layout so a resumed run is a
    true continuation (scripts/trainer_no_adv.py:152-162): model weights,
    optimizer moments (incl. schedule count), scheduler descriptor,
    best_perf, plus the host RNG state (JSON) that drives quantization
    dropout — the reference leaves RNG unsaved, we fix that.
    """
    if jax.process_index() != 0:
        return os.path.join(save_path, tag)
    os.makedirs(save_path, exist_ok=True)
    payload = {
        "step": step,
        "model_state_dict": _to_numpy(model_state),
        "optimizer_state_dict": _to_serializable(optimizer_state)
        if optimizer_state is not None else {},
        "scheduler_state_dict": scheduler_state or {},
        "best_perf": float(best_perf),
    }
    if rng_state is not None:
        payload["rng_state"] = rng_state
    if extra:
        for k, v in extra.items():
            payload[k] = v if isinstance(v, (str, int, float)) \
                else _to_serializable(v)
    path = os.path.join(save_path, tag)
    # Atomic write: serialize to a temp file in the same directory, then
    # os.replace — a kill mid-write leaves the previous valid checkpoint
    # intact instead of a truncated file (matters for rolling saves that
    # overwrite the only copy in place).
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Read a raw checkpoint payload (structure-free msgpack tree)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(path: str, model_state_target: Any,
                 optimizer_state_target: Any = None,
                 extra_targets: Optional[Dict[str, Any]] = None
                 ) -> Dict[str, Any]:
    """Load a checkpoint and restore pytrees against target structures
    (shapes/dtypes validated by flax ``from_state_dict`` semantics).

    ``extra_targets`` maps payload keys (e.g. ``model_disc_state_dict``,
    ``optimizer_disc_state_dict``) to live target pytrees; keys absent
    from the payload are left untouched in the returned dict.
    """
    payload = load_checkpoint(path)
    out = dict(payload)
    out["model_state_dict"] = serialization.from_state_dict(
        model_state_target, payload["model_state_dict"])
    if optimizer_state_target is not None and payload.get(
            "optimizer_state_dict"):
        out["optimizer_state_dict"] = serialization.from_state_dict(
            optimizer_state_target, payload["optimizer_state_dict"])
    for key, target in (extra_targets or {}).items():
        if payload.get(key):
            out[key] = serialization.from_state_dict(target, payload[key])
    return out
