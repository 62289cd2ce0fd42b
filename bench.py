#!/usr/bin/env python
"""Benchmark: training throughput (augmentation + forward + backward + update)
in images/sec on one chip, on the flagship pose-estimator configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (opentrack/neuralnet-tracker-traincode) publishes no
throughput numbers (SURVEY.md section 6). `REFERENCE_BASELINE_IPS` below is an
estimate of the single-A100 PyTorch pipeline throughput at the default config
(MobileNetV1 bs64, CPU-worker cv2/kornia augmentation — which bottlenecks the
GPU): ~3000 images/s. vs_baseline is measured/estimated; the BASELINE.json
target is vs_baseline >= 5.
"""

import json
import os
import sys
import time
from os.path import dirname, realpath

sys.path.insert(0, dirname(realpath(__file__)))

REFERENCE_BASELINE_IPS = 3000.0

# Default config mirrors the reference's training run: MobileNetV1, batch 64,
# NLL heads on, full augmentation, 450x450 sources (300W-LP image size).
# Timing is value-fetch-fenced (see main()): `block_until_ready` through the
# tunneled runtime returns at enqueue, which inflated earlier rounds' numbers
# by orders of magnitude. XLA:TPU compile time through the tunnel varies
# wildly at large batches, so without BENCH_BATCH set, main() tries the
# largest batch in a subprocess with a timeout and falls back
# (512 -> 256 -> 128); a persistent compilation cache makes repeat runs cheap.
BATCH = int(os.environ.get("BENCH_BATCH", 0))
SRC = int(os.environ.get("BENCH_SRC", 448))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
# Optimizer steps fused per device dispatch (lax.scan over stacked batches,
# `PoseTrainer.train_step_multi`). Per-step cost for this small model is
# dispatch-latency-dominated through the tunnel; scanning K steps amortizes it.
SCAN = int(os.environ.get("BENCH_SCAN", 1))
E2E = bool(os.environ.get("BENCH_E2E"))  # or pass --e2e
CACHE_DIR = os.path.join(dirname(realpath(__file__)), ".cache", "jax")


def orchestrate():
    """Try configs best->cheapest, each as a subprocess with a timeout."""
    import subprocess

    # b1024 was tried and dropped: its XLA:TPU compile exceeds 30 min through
    # the tunnel (see docs/PERFORMANCE.md "Compile-time scaling").
    # b128/scan-8 leads: the round-5 batch x K sweep measured it FASTEST of
    # every config tried (18,550 img/s/chip vs 15,694 for the best b512
    # config — per-image step cost is ~18% lower at b128 than b512, see
    # docs/PERFORMANCE.md "Small-batch device rates"), and its cold compile
    # fit a 600 s budget. b512/scan-16 is the fallback, then cheaper configs.
    for batch, scan, budget in ((128, 8, 600), (512, 16, 600), (512, 8, 540), (256, 8, 480), (512, 1, 480), (128, 1, 600)):
        env = dict(os.environ, BENCH_BATCH=str(batch), BENCH_SCAN=str(scan))
        try:
            out = subprocess.run(
                [sys.executable, realpath(__file__)],
                env=env, capture_output=True, text=True, timeout=budget,
            )
        except subprocess.TimeoutExpired:
            print(f"batch {batch} scan {scan} exceeded {budget}s; falling back", file=sys.stderr)
            continue
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode == 0 and lines:
            print(lines[-1])
            return
        print(f"batch {batch} scan {scan} failed rc={out.returncode}", file=sys.stderr)
    raise SystemExit("all bench configurations failed")


def _make_e2e_dataset(path: str, n: int, src: int) -> str:
    """Synthesize an HDF5 pose dataset with src x src JPEG images (300W-LP-like)."""
    import cv2  # noqa: F401  (imencode used by the writer)
    import h5py
    import numpy as np

    from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory as C
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import create_pose_dataset

    if os.path.isfile(path):
        with h5py.File(path, "r") as f:
            if len(f["images"]) == n and int(f.attrs.get("bench_src", 0)) == src:
                return path
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        ds = create_pose_dataset(f, C.image, count=n)
        base = (rng.rand(src, src) * 255).astype(np.uint8)
        for i in range(n):
            img = np.roll(base, i * 7 % src, axis=1)
            ds[i] = img
        create_pose_dataset(
            f, C.quat, count=n, dtype=np.float32,
            data=np.tile(np.asarray([0, 0, 0, 1], np.float32), (n, 1)),
        )
        create_pose_dataset(
            f, C.xys, count=n, dtype=np.float32,
            data=(rng.rand(n, 3) * 100 + 100).astype(np.float32),
        )
        create_pose_dataset(
            f, C.roi, count=n, dtype=np.float32,
            data=np.tile(np.asarray([100.0, 100, 350, 350], np.float32), (n, 1)),
        )
        create_pose_dataset(
            f, C.points, name="pt3d_68", count=n, shape_wo_batch_dim=(68, 3),
            dtype=np.float32, data=(rng.rand(n, 68, 3) * 200 + 100).astype(np.float32),
        )
        create_pose_dataset(
            f, C.general, name="shapeparams", count=n, shape_wo_batch_dim=(50,),
            dtype=np.float16, data=rng.randn(n, 50).astype(np.float16),
        )
        f.attrs["bench_src"] = src
    return path


def bench_e2e(trainer, state, mesh, W, key, batchsize: int):
    """Sustained throughput of loader -> device prefetch -> train_step."""
    import jax
    import numpy as np  # noqa: F401

    from neuralnet_tracker_traincode_tpu.data.fields import Tag
    from neuralnet_tracker_traincode_tpu.data.loader import FusedBatchLoader, device_prefetch
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import Hdf5PoseDataset
    from neuralnet_tracker_traincode_tpu.data.sampling import (
        ConcatDataset,
        make_concat_dataset_item_sampler,
    )

    n_steps = max(STEPS, 20)
    path = _make_e2e_dataset("/tmp/bench_e2e.h5", 4096, SRC)
    ds = Hdf5PoseDataset(path, dataclass=Tag.POSE_WITH_LANDMARKS)
    ds.use_raw_images = True
    concat = ConcatDataset([ds])
    workers = int(os.environ.get("NUM_WORKERS", max(1, (os.cpu_count() or 1))))
    # Budget: each worker can strand one PARTIAL batch when the finite stream
    # dries up, so grant (workers + margin) extra batches' worth of indices —
    # otherwise a many-core host starves the loop of complete batches.
    sampler = make_concat_dataset_item_sampler(
        concat, [1.0], stop_after=batchsize * (n_steps + 4 + workers), seed=1
    )
    loader = FusedBatchLoader(
        concat,
        tags_by_dataset_index=lambda i: Tag.POSE_WITH_LANDMARKS,
        tag_to_id={Tag.POSE_WITH_LANDMARKS: 0},
        sampler=sampler,
        batchsize=batchsize,
        pad_size=SRC,
        num_workers=workers,
    )
    it = device_prefetch(iter(loader), mesh)
    # Warm up: first batch covers loader spin-up + any remaining compiles.
    try:
        sharded = next(it)
    except StopIteration:
        raise SystemExit("e2e bench loader produced no batches (worker starvation?)")
    state, metrics = trainer.train_step(state, sharded, W, key)
    float(jax.device_get(metrics["loss"]))  # value fence (see main())

    steps = 0
    t0 = time.perf_counter()
    for i, sharded in enumerate(it):
        state, metrics = trainer.train_step(state, sharded, W, jax.random.fold_in(key, i))
        steps += 1
        if steps >= n_steps:
            break
    float(jax.device_get(metrics["loss"]))  # value fence
    dt = (time.perf_counter() - t0) / max(steps, 1)
    import jax as _jax

    return batchsize / dt / len(_jax.devices()), workers


def main():
    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    import numpy as np

    from neuralnet_tracker_traincode_tpu.augmentation.pipeline import TrainAugmentationConfig
    from neuralnet_tracker_traincode_tpu.data.fields import Tag
    from neuralnet_tracker_traincode_tpu.data.loader import LABEL_CATEGORIES
    from neuralnet_tracker_traincode_tpu.losses import losses as L, nll as NLL
    from neuralnet_tracker_traincode_tpu.losses.criterion import (
        Criterion,
        CriterionGroup,
        MaskedMultiTaskCriterion,
    )
    from neuralnet_tracker_traincode_tpu.models.posenet import NetworkWithPointHead
    from neuralnet_tracker_traincode_tpu.parallel.mesh import make_mesh, shard_batch
    from neuralnet_tracker_traincode_tpu.train.loop import PoseTrainer, TrainerConfig

    model = NetworkWithPointHead(
        enable_point_head=True, enable_uncertainty=True, config="mobilenetv1",
        dtype=jnp.bfloat16,
    )
    criterion = MaskedMultiTaskCriterion(
        {
            Tag.POSE_WITH_LANDMARKS: CriterionGroup(
                [
                    Criterion("nllrot", NLL.QuatPoseNLLLoss(), 0.005),
                    Criterion("nllcoord", NLL.CorrelatedCoordPoseNLLLoss(), 0.005),
                    Criterion("rot", L.QuatPoseLoss("approx_distance"), 1.0),
                    Criterion("xy", L.PoseXYLoss("l2"), 0.25),
                    Criterion("sz", L.PoseSizeLoss("l2"), 0.25),
                    Criterion("points3d", L.Points3dLoss("l2", chin_weight=0.8), 0.5),
                    Criterion("box", L.BoxLoss("l2"), 0.01),
                    Criterion("quatreg", L.QuaternionNormalizationSoftConstraint(), 1e-6),
                ]
            )
        },
        [Tag.POSE_WITH_LANDMARKS],
    )
    cfg = TrainerConfig(
        batchsize=BATCH, epochs=100, samples_per_epoch=10240,
        aug=TrainAugmentationConfig(inputsize=129, enable_image_aug=True),
    )
    mesh = make_mesh()
    trainer = PoseTrainer(model, criterion, cfg, LABEL_CATEGORIES, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), (129, 129, 1))

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randint(0, 256, size=(BATCH, SRC, SRC, 1), dtype=np.uint8),
        "pose": np.tile(np.asarray([0.0, 0, 0, 1], np.float32), (BATCH, 1)),
        "coord": (rng.rand(BATCH, 3) * 100 + 100).astype(np.float32),
        "roi": np.tile(np.asarray([100.0, 100, 350, 350], np.float32), (BATCH, 1)),
        "pt3d_68": (rng.rand(BATCH, 68, 3) * 200 + 100).astype(np.float32),
        "shapeparam": rng.randn(BATCH, 50).astype(np.float32),
        "hasface": np.full((BATCH,), 0.9, np.float32),
        "coord_convention_id": np.zeros((BATCH,), np.int32),
        "tag_id": np.zeros((BATCH,), np.int32),
        "dataset_weight": np.ones((BATCH,), np.float32),
        "param_index": np.arange(BATCH, dtype=np.int32),
    }
    W = trainer.weight_matrix(50)
    key = jax.random.PRNGKey(7)

    # e2e mode measures the host-bound loader->device pipeline with the plain
    # per-batch step (the loader, not dispatch, is the bottleneck there).
    scan = 1 if E2E else SCAN
    if scan > 1:
        from neuralnet_tracker_traincode_tpu.parallel.mesh import shard_stacked_batch

        # K distinct batches per dispatch (rolled rows — content must vary a
        # little, as in real training, though within-dispatch scan iterations
        # cannot be elided anyway).
        stacked = {k: np.stack([np.roll(v, i, axis=0) for i in range(scan)]) for k, v in batch.items()}
        sharded = shard_stacked_batch(stacked, mesh)
        step = trainer.train_step_multi
    else:
        sharded = shard_batch(batch, mesh)
        step = trainer.train_step

    # Warmup / compile. NOTE on timing honesty: through the tunneled runtime,
    # `jax.block_until_ready` returns at enqueue time, not execution end —
    # timing with it under-reports by orders of magnitude (the round-1/2
    # "127-159k img/s" figures were this artifact). Fetching a VALUE
    # (device_get) is the only trustworthy fence: the final loss depends on
    # the whole step chain, so the fetch forces every dispatch to execute.
    state, metrics = step(state, sharded, W, key)
    # scan mode returns per-step losses of shape (K,); fence on the last one
    float(np.asarray(jax.device_get(metrics["loss"])).ravel()[-1])

    # Distinct key per step like real training: the runtime also elides
    # dispatches with fully identical arguments, which would inflate the
    # number (measured: same-key aug-only steps report 0.05 ms vs 30 ms real).
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, sharded, W, jax.random.fold_in(key, i))
    # value fence (one RTT ~30 ms amortized); ravel: scan mode yields (K,)
    float(np.asarray(jax.device_get(metrics["loss"])).ravel()[-1])
    dt = (time.perf_counter() - t0) / STEPS
    n_chips = len(jax.devices())
    ips_per_chip = scan * BATCH / dt / n_chips

    if E2E:
        e2e_ips, workers = bench_e2e(trainer, state, mesh, W, key, BATCH)
        print(
            json.dumps(
                {
                    "metric": "e2e train images/sec/chip (hdf5+decode+pack -> aug+fwd+bwd)",
                    "value": round(e2e_ips, 1),
                    "unit": "images/s/chip",
                    "vs_baseline": round(e2e_ips / REFERENCE_BASELINE_IPS, 3),
                    "device_only": round(ips_per_chip, 1),
                    "host_workers": workers,
                    "host_cores": os.cpu_count(),
                }
            )
        )
        return

    print(
        json.dumps(
            {
                "metric": "train images/sec/chip (aug+fwd+bwd)",
                "value": round(ips_per_chip, 1),
                "unit": "images/s/chip",
                "vs_baseline": round(ips_per_chip / REFERENCE_BASELINE_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        os.environ["BENCH_E2E"] = "1"
        E2E = True
    if BATCH == 0:
        orchestrate()
    else:
        main()
