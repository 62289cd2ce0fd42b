"""Worker process for the 2-process multi-host test (not collected by pytest).

Usage: python multihost_worker.py <process_id> <num_processes> <port>

Validates (on a CPU `jax.distributed` setup with 4 virtual devices per
process) that
 1. `shard_batch` assembles a global array from process-local shards
    (`jax.make_array_from_process_local_data`) and cross-process collectives
    compute the correct global reduction;
 2. the FULL jitted training step (augmentation + fwd + bwd + update) runs
    over the global 8-device mesh with per-host input batches — the
    multi-process analog of `__graft_entry__.dryrun_multichip`.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 --xla_cpu_multi_thread_eigen=false"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.realpath(__file__)), ".."))

from neuralnet_tracker_traincode_tpu.parallel.mesh import (
    make_mesh,
    process_local_seed,
    shard_batch,
)

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert len(jax.local_devices()) == 4

mesh = make_mesh()

# --- 1. input-path correctness: local shards -> global array -> global mean.
LOCAL = 8
local = {"x": np.random.RandomState(100 + pid).rand(LOCAL, 5).astype(np.float32)}
sharded = shard_batch(local, mesh)
assert sharded["x"].shape == (LOCAL * nproc, 5), sharded["x"].shape

mean = float(jax.jit(lambda b: jnp.mean(b["x"]))(sharded))
expected = np.mean(
    np.concatenate([np.random.RandomState(100 + i).rand(LOCAL, 5) for i in range(nproc)])
)
assert abs(mean - expected) < 1e-6, (mean, expected)

# Per-host sampler seeds are deterministic and disjoint.
seeds = [process_local_seed(1234) for _ in range(2)]
assert seeds[0] == seeds[1]

# --- 2. full training step over the global mesh with per-host batches.
from neuralnet_tracker_traincode_tpu.augmentation.pipeline import TrainAugmentationConfig
from neuralnet_tracker_traincode_tpu.data.fields import Tag
from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES
from neuralnet_tracker_traincode_tpu.losses import losses as L
from neuralnet_tracker_traincode_tpu.losses.criterion import (
    Criterion,
    CriterionGroup,
    MaskedMultiTaskCriterion,
)
from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead
from neuralnet_tracker_traincode_tpu.train.loop import PoseTrainer, TrainerConfig

model = NetworkWithPointHead(enable_point_head=True, config="mobilenetv1")
criterion = MaskedMultiTaskCriterion(
    {
        Tag.POSE_WITH_LANDMARKS: CriterionGroup(
            [
                Criterion("rot", L.QuatPoseLoss("approx_distance"), 1.0),
                Criterion("xy", L.PoseXYLoss("l2"), 0.25),
            ]
        ),
        Tag.ONLY_POSE: CriterionGroup(
            [Criterion("rot", L.QuatPoseLoss("approx_distance"), 1.0)]
        ),
    },
    [Tag.POSE_WITH_LANDMARKS, Tag.ONLY_POSE],
)
B_GLOBAL = 2 * 4 * nproc  # 2 samples per device
B_LOCAL = B_GLOBAL // nproc
cfg = TrainerConfig(
    batchsize=B_GLOBAL,
    epochs=2,
    samples_per_epoch=2 * B_GLOBAL,
    aug=TrainAugmentationConfig(inputsize=129, enable_image_aug=True, oversample=1),
)
trainer = PoseTrainer(model, criterion, cfg, LABEL_CATEGORIES, mesh=mesh)
state = trainer.init_state(jax.random.PRNGKey(0), (129, 129, 1))

rng = np.random.RandomState(pid)  # per-host local shard, like the sharded sampler
batch = {
    "image": (rng.rand(B_LOCAL, 160, 160, 1) * 255).astype(np.uint8),
    "pose": np.tile(np.asarray([0.0, 0, 0, 1], np.float32), (B_LOCAL, 1)),
    "coord": (rng.rand(B_LOCAL, 3) * 40 + 40).astype(np.float32),
    "roi": np.tile(np.asarray([30.0, 30, 120, 120], np.float32), (B_LOCAL, 1)),
    "pt3d_68": (rng.rand(B_LOCAL, 68, 3) * 60 + 40).astype(np.float32),
    "shapeparam": rng.randn(B_LOCAL, 50).astype(np.float32),
    "hasface": np.full((B_LOCAL,), 0.9, np.float32),
    "coord_convention_id": np.zeros((B_LOCAL,), np.int32),
    "tag_id": (np.arange(B_LOCAL) % 2).astype(np.int32),
    "dataset_weight": np.ones((B_LOCAL,), np.float32),
    "param_index": np.arange(B_LOCAL, dtype=np.int32),
}
sharded = shard_batch(batch, mesh)
assert sharded["image"].shape[0] == B_GLOBAL
W = trainer.weight_matrix(0)
state, metrics = trainer.train_step(state, sharded, W, jax.random.PRNGKey(1))
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
assert int(state.step) == 1

print(f"MULTIHOST_OK pid={pid} mean={mean:.6f} loss={loss:.4f}", flush=True)
