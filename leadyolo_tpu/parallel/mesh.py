"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's DDP/NCCL stack (SURVEY.md §2.7).

The reference's entire parallelism surface is data parallelism: torchrun
process-per-GPU, NCCL all-reduce in backward, DistributedSampler,
rank-0-gated I/O (reference train.py:62-64, 529-539; utils/torch_utils.py:
55-95). Here that whole stack is one ``jax.sharding.Mesh`` over a ``data``
axis: the batch is sharded on its leading dim, params/optimizer state are
replicated, and XLA inserts the gradient all-reduce over ICI (multi-host over
DCN) during jit compilation. SyncBN falls out of the BatchNorm axis_name
option; rank-gating becomes ``jax.process_index() == 0``.

No torchrun analog is needed: the JAX runtime owns process/device setup.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis — the
    DistributedSampler equivalent, but at the array level."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the leading dim sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    """Device-put state fully replicated (params, optimizer, EMA)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def is_main_process() -> bool:
    """Rank-0 gate for logging/checkpointing (reference RANK in {-1, 0})."""
    return jax.process_index() == 0
