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
    """Place a pytree of host arrays onto the mesh, sharded along axis 0.

    Single-process: `batch` holds the GLOBAL batch and is device_put sharded.
    Multi-process (`jax.process_count() > 1`): each process passes its LOCAL
    shard (global_batch / process_count rows — the sampler stream is per-host
    sharded, see `pipelines.make_pose_estimation_loaders`); the global array is
    assembled with `jax.make_array_from_process_local_data`, so no host ever
    materializes the full batch. Exercised by tests/test_multihost.py with a
    2-process CPU `jax.distributed` setup.
    """
    sharding = batch_sharding(mesh, axis_name)

    if jax.process_count() == 1:
        def put(x):
            return jax.device_put(x, sharding)
    else:
        def put(x):
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)


def stacked_batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for a stack of K batches, shape (K, B, ...): batch dim sharded."""
    return NamedSharding(mesh, P(None, axis_name))


def shard_stacked_batch(batches, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of stacked host batches (leading dims (K, B, ...)) onto
    the mesh, sharded along the batch dim (axis 1). Used by the multi-step
    scan dispatch (`train.loop.PoseTrainer.train_step_multi`), which amortizes
    one host dispatch over K optimizer steps. Multi-process semantics match
    `shard_batch` (each process contributes its local rows of axis 1)."""
    sharding = stacked_batch_sharding(mesh, axis_name)

    if jax.process_count() == 1:
        def put(x):
            return jax.device_put(x, sharding)
    else:
        def put(x):
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batches)


def process_local_seed(seed: Optional[int]) -> Optional[int]:
    """Fold the process index into a sampler seed so every host draws a
    disjoint, deterministic stream. None stays None (OS entropy is already
    per-process)."""
    if seed is None or jax.process_count() == 1:
        return seed
    return int((seed * 1000003 + 7919 * jax.process_index()) % (2**31 - 1))
