"""Host input pipeline: sample loading, fixed-shape batch packing, prefetch.

Replaces the reference's multi-process torch DataLoader + pinned-memory
transfer (`datatransformation/loader.py`, `pipelines.py:534-543`). The host
only reads HDF5 rows, decodes JPEGs and packs numpy batches of STATIC shape
(images zero-padded to a fixed size, missing label fields zero-filled, tags as
ints); a background thread keeps a prefetch queue full and batches are placed
on the device mesh asynchronously. All augmentation happens on device.
"""

import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from neuralnet_tracker_traincode_tpu.data.batch import Batch
from neuralnet_tracker_traincode_tpu.data.fields import FieldCategory

# Fused-batch label schema: every batch carries all fields; missing ones are
# zero-filled and masked by the per-tag loss weights.
LABEL_SCHEMA = {
    "pose": (4,),
    "coord": (3,),
    "roi": (4,),
    "pt3d_68": (68, 3),
    "shapeparam": (50,),
    "hasface": (),
}

LABEL_CATEGORIES = {
    "pose": FieldCategory.quat,
    "coord": FieldCategory.xys,
    "roi": FieldCategory.roi,
    "pt3d_68": FieldCategory.points,
    "shapeparam": FieldCategory.general,
    "hasface": FieldCategory.general,
}


from neuralnet_tracker_traincode_tpu.utils import ceil_to_multiple as _bucket


def pack_fused_batch(
    samples: Sequence[Batch],
    tag_ids: Sequence[int],
    pad_size: int,
    dataset_weights: Optional[Sequence[float]] = None,
    decode_threads: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Pack per-sample Batches into one fixed-shape fused batch dict.

    Images are zero-padded into (B, pad_size, pad_size, C) WITHOUT rescaling so
    pixel coordinates stay valid. Samples may be single frames or sequences
    (sequences contribute their frames with a shared param_index).

    An image larger than `pad_size` (e.g. a dataset whose biggest frame escaped
    the size probe) grows this batch's padding to the next 64-multiple instead
    of failing; the consumer pays one extra XLA compile per new bucket.
    """
    frames: List[Batch] = []
    frame_tags: List[int] = []
    frame_weights: List[float] = []
    param_index: List[int] = []
    for si, s in enumerate(samples):
        start = len(frames)
        if s.meta.seq:
            subframes = [f for seq in s.undo_collate() for f in seq.iter_frames()]
        else:
            subframes = [s]
        for f in subframes:
            frames.append(f)
            frame_tags.append(tag_ids[si])
            frame_weights.append(1.0 if dataset_weights is None else dataset_weights[si])
            param_index.append(start)

    from neuralnet_tracker_traincode_tpu.data.hdf5 import RawJpegBuffer

    def materialize(im):
        return im.decode() if isinstance(im, RawJpegBuffer) else np.asarray(im)

    B = len(frames)
    raw = [f["image"] for f in frames]

    def image_dims(im):
        if isinstance(im, RawJpegBuffer):
            return im.height, im.width
        return np.asarray(im).shape[:2]

    largest = max(max(image_dims(im)) for im in raw)
    if largest > pad_size:
        import jax

        if jax.process_count() > 1:
            # Growing the pad locally would give THIS host a different batch
            # shape than its peers — the SPMD train step would then crash or
            # deadlock at a random step. Fail loudly instead.
            raise ValueError(
                f"image of size {largest} exceeds pad_size {pad_size} under "
                f"multi-process execution; set an exact pad_size (or store the "
                f"max_image_hw attr at conversion time) so all hosts agree"
            )
        pad_size = _bucket(largest)

    images = None
    if all(isinstance(im, RawJpegBuffer) for im in raw):
        # Fast path: decode the whole batch with the native threaded libjpeg
        # pack straight into the padded layout (native/nntc_loader.cpp); the
        # per-image fallback below handles a missing native lib.
        from neuralnet_tracker_traincode_tpu.data.native_loader import pack_jpeg_batch_gray

        packed = pack_jpeg_batch_gray([im.buffer for im in raw], pad_size, decode_threads)
        if packed is not None:
            images = packed[0]
    if images is None:
        C = materialize(raw[0]).shape[-1]
        images = np.zeros((B, pad_size, pad_size, C), np.uint8)
        for i, im in enumerate(raw):
            img = materialize(im)
            h, w = img.shape[:2]
            images[i, :h, :w, :] = img
    out: Dict[str, np.ndarray] = {}
    for k, shape in LABEL_SCHEMA.items():
        out[k] = np.zeros((B,) + shape, np.float32)
    out["coord_convention_id"] = np.zeros((B,), np.int32)

    for i, f in enumerate(frames):
        for k in LABEL_SCHEMA:
            if k in f:
                v = np.asarray(f[k])
                if v.dtype == np.bool_ or k == "hasface":
                    # Label smoothing of binary labels (reference normalize_batch).
                    v = np.where(v.astype(np.float32) > 0.5, 0.9, 0.1)
                out[k][i] = v.astype(np.float32)
        if "coord_convention_id" in f:
            out["coord_convention_id"][i] = int(f["coord_convention_id"])
    out["image"] = images
    out["tag_id"] = np.asarray(frame_tags, np.int32)
    out["dataset_weight"] = np.asarray(frame_weights, np.float32)
    out["param_index"] = np.asarray(param_index, np.int32)
    return out


class FusedBatchLoader:
    """Iterates fixed-size fused training batches with background prefetch.

    datasets: list of (dataset, tag) pairs; sampler yields global indices into
    their concatenation. Each batch draws `batchsize` FRAMES (sequences count
    with their length).
    """

    def __init__(
        self,
        concat_dataset,
        tags_by_dataset_index: Callable[[int], Any],
        tag_to_id: Dict[Any, int],
        sampler: Iterable[int],
        batchsize: int,
        pad_size: int,
        dataset_weight_by_index: Optional[Callable[[int], float]] = None,
        prefetch: int = 4,
        num_workers: int = 0,
    ):
        """num_workers: 0/1 = one producer thread (deterministic batch
        composition); N>1 = N producer threads pulling from a shared, locked
        sampler stream. HDF5 reads and the native JPEG decode release the GIL,
        so producers scale with host cores; batch composition then depends on
        thread interleaving (the sampler is an infinite random mix, so the
        training distribution is unchanged)."""
        self.ds = concat_dataset
        self.tags_by_dataset_index = tags_by_dataset_index
        self.tag_to_id = tag_to_id
        self.sampler = sampler
        self.batchsize = batchsize
        self.pad_size = pad_size
        self.dataset_weight_by_index = dataset_weight_by_index
        self.prefetch = max(prefetch, 2 * max(1, num_workers))
        self.num_workers = max(1, int(num_workers))
        self._cumsizes = np.asarray(self.ds.cumulative_sizes)

    def _dataset_index(self, global_index: int) -> int:
        return int(np.searchsorted(self._cumsizes, global_index, side="right"))

    def _make_batch(self, index_iter) -> Dict[str, np.ndarray]:
        samples, tag_ids, weights = [], [], []
        frames = 0
        while frames < self.batchsize:
            gi = next(index_iter)
            s = self.ds[gi]
            dsi = self._dataset_index(gi)
            tag = self.tags_by_dataset_index(dsi)
            n = s.meta.seq[-1] if s.meta.seq else 1
            if frames + n > self.batchsize and samples:
                break  # keep shape static; drop back the long sequence
            samples.append(s)
            tag_ids.append(self.tag_to_id[tag])
            weights.append(
                1.0
                if self.dataset_weight_by_index is None
                else self.dataset_weight_by_index(dsi)
            )
            frames += n
        # Split decode threads across producers to avoid oversubscription.
        import os as _os

        decode_threads = max(1, (_os.cpu_count() or 1) // self.num_workers)
        batch = pack_fused_batch(samples, tag_ids, self.pad_size, weights, decode_threads)
        B = batch["tag_id"].shape[0]
        if B < self.batchsize:
            # Pad with repeats of the first frame at weight 0 to keep shapes static.
            def pad(v):
                reps = np.repeat(v[:1], self.batchsize - B, axis=0)
                return np.concatenate([v, reps], axis=0)

            batch = {k: pad(v) for k, v in batch.items()}
            batch["dataset_weight"][B:] = 0.0
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        raw_iter = iter(self.sampler)
        if self.num_workers > 1:
            # Shared sampler stream: producers pull indices under a lock (the
            # expensive work — HDF5 reads, native decode — happens outside it).
            lock = threading.Lock()

            def locked_next():
                with lock:
                    return next(raw_iter)

            class _LockedIter:
                def __iter__(self):
                    return self

                def __next__(self):
                    return locked_next()

            index_iter = _LockedIter()
        else:
            index_iter = raw_iter

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        # The sampler is typically infinite, so workers must die with the
        # generator: callers create an iterator per epoch, and immortal
        # workers would pile up decoding concurrently for abandoned queues.
        cancel = threading.Event()

        def put_with_cancel(item):
            # Every put must stay cancellable: a blocking put after the
            # consumer abandoned the generator would leak the worker thread
            # (and its HDF5 handles/batch buffers) forever.
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def worker():
            try:
                while not cancel.is_set():
                    item = self._make_batch(index_iter)
                    put_with_cancel(item)
            except StopIteration:
                put_with_cancel(stop)
            except Exception as e:  # propagate into the consumer
                put_with_cancel(e)

        threads = [
            threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        stopped = 0
        try:
            while True:
                item = q.get()
                if item is stop:
                    stopped += 1
                    if stopped == self.num_workers:
                        return
                    continue
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            cancel.set()


def device_prefetch(iterator, mesh, size: int = 2):
    """Move batches onto the mesh ahead of consumption (double buffering)."""
    from neuralnet_tracker_traincode_tpu.parallel.mesh import shard_batch

    import collections

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(shard_batch(next(it), mesh))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(shard_batch(next(it), mesh))
        except StopIteration:
            pass
        yield out
