#!/usr/bin/env python
"""Benchmark the host input pipeline: HDF5 row reads, JPEG decode, batch pack.

The device path trains at >100k images/s/chip (see bench.py); on a
few-core host the input pipeline is the practical limiter of real runs, as
it was for the reference (its CPU DataLoader workers bottlenecked the GPU).
This prints a stage-by-stage breakdown:

  h5 read      raw varsize-JPEG buffer reads from the file
  decode       native libjpeg grayscale decode (or cv2 fallback)
  pack         FusedBatchLoader end-to-end batch assembly
"""

import argparse
import os
import sys
import time
from os.path import dirname, join, realpath

import numpy as np

sys.path.insert(0, join(dirname(realpath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ds", type=str, default=None,
                        help=".h5 file (default: a generated synthetic one)")
    parser.add_argument("-n", type=int, default=512, help="samples per stage")
    parser.add_argument("--batchsize", type=int, default=64)
    parser.add_argument("--raw", action="store_true", default=False,
                        help="raw-JPEG fast path (native threaded batch decode)")
    parser.add_argument("--workers", type=int, default=1, help="loader workers")
    parser.add_argument("--worker-type", default="auto",
                        choices=("auto", "thread", "process"))
    parser.add_argument("--no-shm", action="store_false", dest="shared_memory",
                        default=True,
                        help="pickle image payloads through the mp queue "
                        "instead of the shared-memory slot ring")
    args = parser.parse_args()

    import h5py

    from neuralnet_tracker_traincode_tpu.data import native_loader
    from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory, Tag
    from neuralnet_tracker_traincode_tpu.data.loader import FusedBatchLoader
    from neuralnet_tracker_traincode_tpu.data.pose_dataset import (
        Hdf5PoseDataset,
        create_pose_dataset,
    )
    from neuralnet_tracker_traincode_tpu.data.sampling import (
        ConcatDataset,
        make_concat_dataset_item_sampler,
    )

    fn = args.ds
    if fn is None:
        import cv2

        fn = "/tmp/bench_loader.h5"
        rng = np.random.RandomState(0)
        n = max(args.n, 256)
        with h5py.File(fn, "w") as f:
            ds = create_pose_dataset(f, FieldCategory.image, count=n)
            for i in range(n):
                img = (rng.rand(256, 256) * 255).astype(np.uint8)
                ds[i] = img
            quats = np.tile(np.asarray([0, 0, 0, 1], np.float32), (n, 1))
            create_pose_dataset(f, FieldCategory.quat, count=n, dtype=np.float32, data=quats)
            coords = np.tile(np.asarray([128, 128, 40], np.float32), (n, 1))
            create_pose_dataset(f, FieldCategory.xys, count=n, dtype=np.float32, data=coords)
            rois = np.tile(np.asarray([64, 64, 192, 192], np.float32), (n, 1))
            create_pose_dataset(f, FieldCategory.roi, count=n, dtype=np.float32, data=rois)
        print(f"Generated synthetic {fn} ({n} x 256x256 jpegs)")

    N = args.n

    # Stage 1: raw buffer reads
    with h5py.File(fn, "r") as f:
        images = f["images"]
        count = min(N, len(images))
        t0 = time.perf_counter()
        buffers = [np.asarray(images[i % len(images)]) for i in range(count)]
        dt = time.perf_counter() - t0
    print(f"h5 read:  {count / dt:8.0f} samples/s ({dt / count * 1e3:.2f} ms ea)")

    # Stage 2: decode
    use_native = native_loader.get_lib() is not None
    t0 = time.perf_counter()
    for b in buffers:
        if b.ndim == 1:  # varsize jpeg buffer
            if use_native:
                native_loader.decode_jpeg_gray(b, 4096)
            else:
                import cv2

                cv2.imdecode(b, cv2.IMREAD_GRAYSCALE)
    dt = time.perf_counter() - t0
    if buffers and buffers[0].ndim == 1:
        backend = "native libjpeg" if use_native else "cv2"
        print(f"decode:   {count / dt:8.0f} samples/s ({backend})")
    else:
        print("decode:   images stored raw; skipped")

    # Stage 3: full FusedBatchLoader path
    ds = Hdf5PoseDataset(fn, dataclass=Tag.ONLY_POSE)
    ds.use_raw_images = args.raw
    concat = ConcatDataset([ds])
    sampler = make_concat_dataset_item_sampler(concat, [1.0])
    pad = 0
    for i in range(min(8, len(ds))):
        h, w = ds[i]["image"].shape[:2]
        pad = max(pad, h, w)
    loader = FusedBatchLoader(
        concat,
        tags_by_dataset_index=lambda i: Tag.ONLY_POSE,
        tag_to_id={Tag.ONLY_POSE: 0},
        sampler=sampler,
        batchsize=args.batchsize,
        pad_size=pad,
        num_workers=args.workers,
        worker_type=args.worker_type,
        shared_memory=args.shared_memory,
    )
    it = iter(loader)
    next(it)  # warm up the prefetch thread
    steps = max(1, N // args.batchsize)
    t0 = time.perf_counter()
    for _ in range(steps):
        batch = next(it)
    dt = time.perf_counter() - t0
    total = steps * args.batchsize
    mode = "raw-jpeg native pack" if args.raw else "per-sample decode"
    transport = ""
    if loader.worker_type == "process":
        transport = ", shm ring" if args.shared_memory else ", pickled queue"
    print(f"pack:     {total / dt:8.0f} samples/s (FusedBatchLoader end-to-end, "
          f"batch {args.batchsize}, pad {pad}, {mode}, "
          f"{args.workers} {loader.worker_type} worker(s){transport})")


if __name__ == "__main__":
    main()
