#!/usr/bin/env python
"""Measure the REFERENCE pipeline's per-core host throughput in-image, to
defend the `REFERENCE_BASELINE_IPS` denominator in bench.py.

The reference (opentrack/neuralnet-tracker-traincode) publishes no throughput
numbers (SURVEY.md section 6). Its training pipeline is: DataLoader worker
processes running, per sample, HDF5 read -> JPEG decode (cv2) -> half-pixel
offset -> RandomFocusRoi cv2 warpAffine -> flip/rot90 -> normalize
(`/root/reference/trackertraincode/pipelines.py:372-389`), feeding a
single-GPU torch train step (kornia intensity augs + fwd + bwd on device).
The CPU-side per-sample transform chain is the published bottleneck claim
this repo's A100 extrapolation rests on; this script measures that chain
with the ACTUAL reference code on this host, plus the torch-CPU model step
as a secondary data point.

Usage: python scripts/bench_reference_baseline.py  (prints JSON lines)

Output feeds docs/BASELINE-notes (see BASELINE.md): A100-host baseline =
min(worker_cores x per-core-chain-rate, GPU step rate). No reference code is
copied; the reference modules are imported and driven as-is (same mechanism
as tests/test_reference_parity.py).
"""

import json
import sys
import time
from functools import partial
from os.path import dirname, join, realpath

sys.path.insert(0, join(dirname(dirname(realpath(__file__))), "tests"))
sys.path.insert(0, dirname(dirname(realpath(__file__))))

import numpy as np

import refstubs

refstubs.install()

import cv2  # noqa: E402
import torch  # noqa: E402

torch.set_num_threads(1)  # per-core rates; the reference pins worker threads to 1
cv2.setNumThreads(1)

import trackertraincode.datatransformation as dtr  # noqa: E402
from trackertraincode.datasets.batch import Batch, Metadata  # noqa: E402
from trackertraincode.datasets.dshdf5pose import FieldCategory  # noqa: E402

SRC = 448  # 300W-LP-scale source resolution (the repo bench uses the same)
N = 300


def make_sample(rng) -> Batch:
    meta = Metadata(_imagesize=SRC, batchsize=0, categories={
        "image": FieldCategory.image,
        "pose": FieldCategory.quat,
        "coord": FieldCategory.xys,
        "roi": FieldCategory.roi,
        "pt3d_68": FieldCategory.points,
    })
    return Batch(meta, {
        "image": torch.from_numpy(
            rng.randint(0, 256, size=(SRC, SRC, 1), dtype=np.uint8)
        ),
        "pose": torch.from_numpy(np.asarray([0.0, 0, 0, 1], np.float32)),
        "coord": torch.from_numpy((rng.rand(3) * 100 + 100).astype(np.float32)),
        "roi": torch.from_numpy(np.asarray([100.0, 100, 350, 350], np.float32)),
        "pt3d_68": torch.from_numpy((rng.rand(68, 3) * 200 + 100).astype(np.float32)),
    })


def bench_transform_chain():
    """The per-sample train transform chain (reference pipelines.py:372-383),
    roi_override='original' as in the readme's baseline run."""
    rng = np.random.RandomState(0)
    chain = [
        dtr.batch.offset_points_by_half_pixel,
        dtr.batch.RandomFocusRoi(129, rotation_aug_angle=30.0, extension_factor=1.1),
        partial(dtr.batch.horizontal_flip_and_rot_90, 0.01),
        dtr.batch.normalize_batch,
    ]
    samples = [make_sample(rng) for _ in range(32)]
    for s in samples[:4]:  # warmup
        b = s
        for t in chain:
            b = t(b)
    t0 = time.perf_counter()
    for i in range(N):
        b = samples[i % len(samples)]
        for t in chain:
            b = t(b)
    dt = time.perf_counter() - t0
    return N / dt


def bench_decode():
    """cv2 JPEG decode at source resolution (worker-side, precedes the chain)."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(SRC, SRC), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    buf = np.asarray(buf)
    for _ in range(5):
        cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
    t0 = time.perf_counter()
    for _ in range(N):
        cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
    return N / (time.perf_counter() - t0)


def bench_torch_cpu_step(batchsize=64):
    """Reference model fwd+bwd+Adam on torch CPU (1 thread) — NOT part of the
    A100 extrapolation (the GPU side is not CPU-extrapolable); recorded as a
    secondary in-image data point."""
    import trackertraincode.neuralnets.modelcomponents as ref_mc
    import trackertraincode.neuralnets.models as ref_models

    # The reference's bfm_noneck_v3.pkl blob is git-LFS-missing in its repo;
    # fill DeformableHeadKeypoints from this repo's derived 68-kp subset
    # (same patch as tests/test_reference_parity.py).
    from neuralnet_tracker_traincode_tpu.facemodel.bfm import BFMModel

    sub = BFMModel()

    def patched(self, num_shape=40, num_expr=10):
        torch.nn.Module.__init__(self)
        self.num_shape, self.num_expr = num_shape, num_expr
        self.num_eigvecs = num_shape + num_expr
        self.register_buffer("keypts", torch.from_numpy(np.asarray(sub.keypts)))
        self.register_buffer(
            "keyeigvecs", torch.from_numpy(np.asarray(sub.scaled_bases[: self.num_eigvecs]))
        )

    ref_mc.DeformableHeadKeypoints.__init__ = patched

    net = ref_models.NetworkWithPointHead(
        enable_point_head=True, enable_uncertainty=True, config="mobilenetv1",
        backbone_args={"use_blurpool": False},
    )
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    x = torch.rand(batchsize, 1, 129, 129)
    reps = 3
    for _ in range(2):
        out = net(x)
        loss = sum(v.square().sum() for v in out.values() if torch.is_tensor(v) and v.is_floating_point())
        opt.zero_grad(); loss.backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = net(x)
        loss = sum(v.square().sum() for v in out.values() if torch.is_tensor(v) and v.is_floating_point())
        opt.zero_grad(); loss.backward(); opt.step()
    dt = (time.perf_counter() - t0) / reps
    return batchsize / dt


def main():
    chain = bench_transform_chain()
    decode = bench_decode()
    worker = 1.0 / (1.0 / chain + 1.0 / decode)  # serial per-sample worker rate
    out = {
        "host": "1-thread, cv2+torch pinned to 1 thread each",
        "src_resolution": SRC,
        "transform_chain_samples_per_s_per_core": round(chain, 1),
        "jpeg_decode_samples_per_s_per_core": round(decode, 1),
        "worker_chain_samples_per_s_per_core": round(worker, 1),
    }
    print(json.dumps(out))
    step = bench_torch_cpu_step()
    print(json.dumps({"torch_cpu_train_step_img_per_s_bs64_1thread": round(step, 1)}))


if __name__ == "__main__":
    main()
