"""SPMD data parallelism over a jax.sharding Mesh.

The reference trains with DDP via HuggingFace accelerate + NCCL
(scripts/trainer_no_adv.py:166, SURVEY §2.5). The TPU-native design is
single-program SPMD: one jitted train step over a 1-D ``data`` mesh,
batch sharded across devices, parameters/optimizer state replicated.
Gradient reduction is the implicit ``psum`` XLA inserts for the
replicated-parameter sharding — it rides the ICI, no explicit
collectives or barriers in user code. Rank-0-only concerns (logging,
checkpointing) map to ``jax.process_index() == 0``.

The model is ~8M params, so tensor/pipeline parallelism is unnecessary
(SURVEY §2.5); scaling is batch-axis only, which is also how the
reference scales (DP-only).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "DataParallel",
           "process_is_main"]


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host SPMD bring-up.

    On a multi-host TPU pod slice, call once per host before building a
    mesh; ``jax.devices()`` then spans every chip in the slice, and the
    same DP mesh/shardings work unchanged — XLA routes the gradient psum
    over ICI within hosts and DCN across them. No-op on single host.
    Returns the process count.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_count()


def process_is_main() -> bool:
    """Host-0 gating (maps the reference's accel.is_main_process)."""
    return jax.process_index() == 0


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


class DataParallel:
    """Helper bundling a mesh with the shardings a DP train loop needs.

    Usage:
        dp = DataParallel()                  # all devices
        state = dp.replicate(state)          # params + opt state
        batch = dp.shard(batch)              # per-step batch
        step = dp.jit_step(train_step_fn)    # in_shardings enforced
    """

    def __init__(self, devices: Optional[Sequence] = None,
                 axis_name: str = "data"):
        self.axis_name = axis_name
        self.mesh = make_mesh(devices, axis_name)
        self.batch_sharding = NamedSharding(self.mesh, P(axis_name))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def shard(self, batch):
        return shard_batch(self.mesh, batch, self.axis_name)

    def replicate(self, tree):
        return replicate(self.mesh, tree)

    def jit_step(self, fn, donate_state: bool = True, **jit_kwargs):
        """jit a ``(state, batch, ...) -> (state, metrics)`` step with DP
        shardings pinned: state replicated, batch sharded, outputs
        (state, metrics) replicated. XLA inserts the gradient psum.
        """
        return jax.jit(
            fn,
            in_shardings=(self.replicated, self.batch_sharding),
            out_shardings=(self.replicated, self.replicated),
            donate_argnums=(0,) if donate_state else (),
            **jit_kwargs,
        )
