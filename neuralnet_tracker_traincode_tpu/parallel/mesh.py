"""Device mesh construction and sharding helpers.

The models here are small CNNs (~10M params) on 129x129 crops, so batch DATA
parallelism is the only strategy that pays (the reference is single-GPU with
no distributed code at all — SURVEY.md section 2.12). Parameters and optimizer
state are replicated; the batch is sharded over the 'data' axis; XLA inserts
the gradient psum over ICI. Multi-host scale-out keeps the same mesh with the
'data' axis spanning ICI-then-DCN transparently (jax.devices() ordering).

TP/PP/SP are deliberately out of scope: there is no sequence dimension and no
layer large enough to shard — documented capability decision, not an omission.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of host arrays onto the mesh, sharded along axis 0."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
