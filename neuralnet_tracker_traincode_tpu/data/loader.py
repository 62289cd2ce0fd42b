"""Host input pipeline: sample loading, fixed-shape batch packing, prefetch.

Replaces the reference's multi-process torch DataLoader + pinned-memory
transfer (`datatransformation/loader.py`, `pipelines.py:534-543`). The host
only reads HDF5 rows, decodes JPEGs and packs numpy batches of STATIC shape
(images zero-padded to a fixed size, missing label fields zero-filled, tags as
ints); worker threads or processes keep a prefetch queue full and batches are
placed on the device mesh asynchronously. All augmentation happens on device.

Determinism: batch COMPOSITION is planned up front by a single consumer of
the sampler stream (`plan_batches`) and plans are dispatched round-robin to
workers; the consumer reads completed batches back in the same round-robin
order. The batch stream is therefore identical for ANY worker count and
worker type — seeded runs no longer need to force one producer.

Scaling: `worker_type="process"` (default for num_workers > 1) runs each
worker in a spawned subprocess with its own pickled copy of the dataset
(HDF5 handles re-open lazily per process, `data/hdf5.py`), sidestepping the
GIL for the Python parts of sample assembly — the process analog of the
reference's torch DataLoader workers (`loader.py:7-116`). Thread workers
remain available (`worker_type="thread"`): HDF5 reads and the native JPEG
decode release the GIL, so they scale until Python-side label packing
saturates one core.
"""

import os
import queue
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, NamedTuple, Optional, Sequence

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

# Per-slot header in the shared-memory image ring: an int64 producer-seq
# stamp the consumer asserts around its copy-out (see _process_worker_main).
_SHM_STAMP_BYTES = 8


def pack_fused_batch(
    samples: Sequence[Batch],
    tag_ids: Sequence[int],
    pad_size: int,
    dataset_weights: Optional[Sequence[float]] = None,
    decode_threads: Optional[int] = None,
    allow_pad_growth: Optional[bool] = None,
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
        if allow_pad_growth is None:
            # Lazy default: single-host runs may grow; multi-host must not
            # (worker subprocesses pass the flag explicitly instead of
            # importing jax).
            import jax

            allow_pad_growth = jax.process_count() == 1
        if not allow_pad_growth:
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


class BatchPlan(NamedTuple):
    """Pre-assigned composition of one fused batch (global indices into the
    concat dataset + per-SAMPLE tag ids and loss weights)."""

    indices: List[int]
    tag_ids: List[int]
    weights: List[float]


def _unwrap_frame_count(ds, index: int) -> int:
    """Frames a sample contributes, WITHOUT loading it (sequence metadata
    only). Unwraps Subset/TransformedDataset/ConcatDataset wrappers."""
    while True:
        if hasattr(ds, "cumulative_sizes"):  # ConcatDataset
            import bisect

            dsi = bisect.bisect_right(ds.cumulative_sizes, index)
            start = 0 if dsi == 0 else ds.cumulative_sizes[dsi - 1]
            ds, index = ds.datasets[dsi], index - start
        elif hasattr(ds, "indices"):  # Subset
            ds, index = ds.dataset, int(ds.indices[index])
        elif hasattr(ds, "sequence_frame_count"):
            return int(ds.sequence_frame_count(index))
        elif hasattr(ds, "dataset"):  # TransformedDataset
            ds = ds.dataset
        else:
            return 1


def _produce_batch(ds, plan: BatchPlan, batchsize: int, pad_size: int,
                   decode_threads: int, allow_pad_growth: bool) -> Dict[str, np.ndarray]:
    samples = [ds[gi] for gi in plan.indices]
    batch = pack_fused_batch(
        samples, plan.tag_ids, pad_size, plan.weights, decode_threads,
        allow_pad_growth=allow_pad_growth,
    )
    B = batch["tag_id"].shape[0]
    if B < batchsize:
        # Pad with repeats of the first frame at weight 0 to keep shapes static.
        def pad(v):
            reps = np.repeat(v[:1], batchsize - B, axis=0)
            return np.concatenate([v, reps], axis=0)

        batch = {k: pad(v) for k, v in batch.items()}
        batch["dataset_weight"][B:] = 0.0
    return batch


def _process_worker_main(ds, in_q, out_q, batchsize, pad_size, decode_threads,
                         allow_pad_growth, shm_name=None, shm_slots=0):
    """Spawned worker: produce batches for pre-assigned plans, in order.

    When `shm_name` is set, the IMAGE plane of each batch is written into a
    slot of that shared-memory ring instead of being pickled through the mp
    queue (the reference's own workers used pinned shared memory,
    `/root/reference/trackertraincode/datatransformation/loader.py:37-45`);
    the queue message then carries (slot, seq, shape, dtype, labels). Slot
    reuse is bounded by queue backpressure: at most qsize + 1 (blocked put)
    + 1 (being produced) batches can be outstanding beyond the one the
    consumer copies out on get(), so `shm_slots = qsize + 3` can never lap.
    Each slot additionally starts with an int64 producer-seq stamp, written
    BEFORE the image bytes; the consumer asserts it against the message seq
    on both sides of its copy-out, so a future change that breaks the
    no-lap bound (deferred unpack, consumer-side buffering) fails loudly
    instead of silently corrupting images. Batches whose padding outgrew
    the slot (allow_pad_growth) fall back to pickling.
    """
    # Never let worker subprocesses grab an accelerator (pack_fused_batch is
    # passed allow_pad_growth explicitly, so jax is not even imported).
    os.environ["JAX_PLATFORMS"] = "cpu"
    shm = None
    try:
        import queue as _q

        slot_bytes = 0
        if shm_name is not None:
            from multiprocessing import shared_memory

            shm = shared_memory.SharedMemory(name=shm_name)
            slot_bytes = shm.size // shm_slots - _SHM_STAMP_BYTES
        seq = 0

        def orphaned() -> bool:
            # Orphan watchdog: daemon=True only covers the parent's NORMAL
            # exit. A SIGKILLed trainer reparents its workers to init, where
            # they would block forever holding the parent's inherited file
            # descriptors (including e.g. accelerator tunnel sockets, which
            # keeps the stale client connection half-open). Both blocking
            # sides (idle get AND full-queue put) must poll for this.
            return os.getppid() == 1

        def put_or_exit(item) -> bool:
            while True:
                try:
                    out_q.put(item, timeout=5)
                    return True
                except _q.Full:
                    if orphaned():
                        # Don't let interpreter exit block on joining the
                        # queue's feeder thread against a dead reader.
                        out_q.cancel_join_thread()
                        return False

        while True:
            try:
                plan = in_q.get(timeout=5)
            except _q.Empty:
                if orphaned():
                    return
                continue
            if plan is None:
                return
            try:
                batch = _produce_batch(
                    ds, plan, batchsize, pad_size, decode_threads, allow_pad_growth
                )
            except Exception as e:  # forward to the parent consumer
                put_or_exit(e)
                return
            img = batch.get("image")
            if (
                shm is not None
                and img is not None
                and img.nbytes <= slot_bytes
            ):
                slot = seq % shm_slots
                stride = slot_bytes + _SHM_STAMP_BYTES
                # Stamp-first write order: the consumer re-reads the stamp
                # on both sides of its copy-out, so a lap (a future bug that
                # breaks the qsize+3 no-lap bound) corrupts loudly, never
                # silently — the stamp flips to the lapping seq before any
                # image byte of the new batch lands.
                stamp = np.ndarray((), np.int64, buffer=shm.buf,
                                   offset=slot * stride)
                stamp[...] = seq
                dst = np.ndarray(img.shape, img.dtype, buffer=shm.buf,
                                 offset=slot * stride + _SHM_STAMP_BYTES)
                dst[...] = img
                rest = {k: v for k, v in batch.items() if k != "image"}
                item = ("shm", slot, seq, img.shape, img.dtype.str, rest)
            else:
                item = batch
            seq += 1
            if not put_or_exit(item):
                return
    except (KeyboardInterrupt, EOFError, BrokenPipeError):
        pass
    finally:
        if shm is not None:
            shm.close()


class FusedBatchLoader:
    """Iterates fixed-size fused training batches with background prefetch.

    datasets: list of (dataset, tag) pairs; sampler yields global indices into
    their concatenation. Each batch draws `batchsize` FRAMES (sequences count
    with their length).

    Batch composition is PLANNED by a single sampler consumer and dispatched
    round-robin, so the batch stream is deterministic for any `num_workers`
    and `worker_type` ("process": spawned subprocesses, the default for
    num_workers > 1; "thread": in-process producers).

    Process workers use the `spawn` start method: script entry points that
    iterate this loader must be guarded with `if __name__ == "__main__":`
    (the same contract as torch's DataLoader with spawned workers); the
    shipped CLIs all are. `shared_memory=True` (default) moves the image
    plane of each batch through a per-worker shared-memory slot ring instead
    of pickling it through the mp queue.
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
        worker_type: str = "auto",
        shared_memory: bool = True,
    ):
        assert worker_type in ("auto", "thread", "process"), worker_type
        self.shared_memory = bool(shared_memory)
        self.ds = concat_dataset
        self.tag_to_id = tag_to_id
        self.sampler = sampler
        self.batchsize = batchsize
        self.pad_size = pad_size
        self.num_workers = max(1, int(num_workers))
        self.prefetch = max(prefetch, 2 * self.num_workers)
        self.worker_type = (
            worker_type
            if worker_type != "auto"
            else ("process" if self.num_workers > 1 else "thread")
        )
        self._cumsizes = np.asarray(self.ds.cumulative_sizes)
        # Materialize the per-dataset tag/weight tables now (finite domain) so
        # nothing unpicklable needs to cross into worker subprocesses.
        n_ds = len(self.ds.datasets)
        self._tag_id_by_ds = [tag_to_id[tags_by_dataset_index(i)] for i in range(n_ds)]
        self._weight_by_ds = [
            1.0 if dataset_weight_by_index is None else float(dataset_weight_by_index(i))
            for i in range(n_ds)
        ]
        import jax

        self._allow_pad_growth = jax.process_count() == 1

    def _dataset_index(self, global_index: int) -> int:
        return int(np.searchsorted(self._cumsizes, global_index, side="right"))

    def plan_batches(self) -> Iterator[BatchPlan]:
        """Deterministically cut the sampler stream into batch plans."""
        carry: Optional[tuple] = None
        it = iter(self.sampler)
        while True:
            indices: List[int] = []
            tag_ids: List[int] = []
            weights: List[float] = []
            frames = 0
            while frames < self.batchsize:
                if carry is not None:
                    gi, n = carry
                    carry = None
                else:
                    try:
                        gi = next(it)
                    except StopIteration:
                        if indices:
                            yield BatchPlan(indices, tag_ids, weights)
                        return
                    n = _unwrap_frame_count(self.ds, gi)
                if frames + n > self.batchsize and indices:
                    carry = (gi, n)  # keep shape static; defer the long sequence
                    break
                dsi = self._dataset_index(gi)
                indices.append(int(gi))
                tag_ids.append(self._tag_id_by_ds[dsi])
                weights.append(self._weight_by_ds[dsi])
                frames += n
            yield BatchPlan(indices, tag_ids, weights)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.worker_type == "process":
            yield from self._iter_process_workers()
        else:
            yield from self._iter_thread_workers()

    # ---- thread backend ---------------------------------------------------

    def _iter_thread_workers(self) -> Iterator[Dict[str, np.ndarray]]:
        W = self.num_workers
        decode_threads = max(1, (os.cpu_count() or 1) // W)
        plans = self.plan_batches()
        per_worker = max(2, self.prefetch // W)
        in_qs = [queue.Queue(maxsize=per_worker) for _ in range(W)]
        out_qs = [queue.Queue(maxsize=per_worker) for _ in range(W)]
        stop = object()
        # The sampler is typically infinite, so workers must die with the
        # generator: callers create an iterator per epoch, and immortal
        # workers would pile up decoding concurrently for abandoned queues.
        cancel = threading.Event()

        def put_with_cancel(q, item):
            # Every put must stay cancellable: a blocking put after the
            # consumer abandoned the generator would leak the worker thread
            # (and its HDF5 handles/batch buffers) forever.
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        # Sampler/planner errors happen on the feeder thread; they must reach
        # the consumer instead of reading as a clean end-of-stream.
        feeder_error = [None]

        def feeder():
            # Round-robin dispatch preserves global batch order.
            w = 0
            try:
                for plan in plans:
                    if not put_with_cancel(in_qs[w], plan):
                        return
                    w = (w + 1) % W
            except Exception as e:
                feeder_error[0] = e
            finally:
                for q_ in in_qs:
                    put_with_cancel(q_, stop)

        def worker(wi):
            try:
                while not cancel.is_set():
                    try:
                        plan = in_qs[wi].get(timeout=0.1)
                    except queue.Empty:
                        continue
                    if plan is stop:
                        put_with_cancel(out_qs[wi], stop)
                        return
                    put_with_cancel(out_qs[wi], _produce_batch(
                        self.ds, plan, self.batchsize, self.pad_size,
                        decode_threads, self._allow_pad_growth,
                    ))
            except Exception as e:  # propagate into the consumer
                put_with_cancel(out_qs[wi], e)

        threads = [threading.Thread(target=feeder, daemon=True)] + [
            threading.Thread(target=worker, args=(i,), daemon=True) for i in range(W)
        ]
        for t in threads:
            t.start()

        # At interpreter exit a daemon worker killed mid-HDF5-read can hold
        # the HDF5 global lock forever and deadlock h5py teardown in the main
        # thread; cancel and join (bounded) before finalization proceeds.
        import atexit

        def cleanup():
            cancel.set()
            for t in threads:
                t.join(timeout=5)

        atexit.register(cleanup)
        try:
            w = 0
            while True:
                item = out_qs[w].get()
                if item is stop:
                    # Dispatch and read-back share the round-robin order, so
                    # the sentinel arrives exactly after the last good batch.
                    if feeder_error[0] is not None:
                        raise feeder_error[0]
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
                w = (w + 1) % W
        finally:
            cleanup()
            atexit.unregister(cleanup)

    # ---- process backend --------------------------------------------------

    def _iter_process_workers(self) -> Iterator[Dict[str, np.ndarray]]:
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        W = self.num_workers
        decode_threads = max(1, (os.cpu_count() or 1) // W)
        per_worker = max(2, self.prefetch // W)
        in_qs = [ctx.Queue(maxsize=per_worker) for _ in range(W)]
        out_qs = [ctx.Queue(maxsize=per_worker) for _ in range(W)]
        # Shared-memory image transport: one slot ring per worker sized for
        # the planned batch shape; the ~16 MB/batch image plane then crosses
        # as one memcpy instead of a pickle through a pipe (measured 12-16%
        # IPC overhead on the pickle path, docs/PERFORMANCE.md). qsize + 3
        # slots can never be lapped (see _process_worker_main docstring).
        shms: List = []
        shm_slots = per_worker + 3
        if self.shared_memory:
            from multiprocessing import shared_memory

            # Slots sized for C=1 uint8 (every pose dataset here); larger
            # images (multi-channel, grown padding) are caught by
            # nbytes > slot_bytes in the worker and fall back to pickling.
            # Each slot carries an 8-byte producer-seq stamp header that the
            # consumer asserts around its copy-out (lap detector).
            slot_bytes = self.batchsize * self.pad_size * self.pad_size
            stride = slot_bytes + _SHM_STAMP_BYTES
            for _ in range(W):
                shms.append(shared_memory.SharedMemory(
                    create=True, size=stride * shm_slots))
        procs = [
            ctx.Process(
                target=_process_worker_main,
                args=(self.ds, in_qs[i], out_qs[i], self.batchsize, self.pad_size,
                      decode_threads, self._allow_pad_growth,
                      shms[i].name if shms else None, shm_slots),
                daemon=True,
            )
            for i in range(W)
        ]
        # Children inherit the environment at start(): pin them to the CPU
        # backend so an incidental jax import during unpickling can never
        # grab the accelerator the parent is training on.
        prev = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            for p in procs:
                p.start()
        finally:
            if prev is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = prev

        cancel = threading.Event()
        plans = self.plan_batches()
        sent = [0] * W
        done_feeding = threading.Event()
        feeder_error = [None]

        def feeder():
            w = 0
            try:
                for plan in plans:
                    while not cancel.is_set():
                        try:
                            in_qs[w].put(plan, timeout=0.1)
                            sent[w] += 1
                            break
                        except queue.Full:
                            continue
                    if cancel.is_set():
                        return
                    w = (w + 1) % W
            except Exception as e:
                feeder_error[0] = e
            finally:
                done_feeding.set()
                for q_ in in_qs:
                    try:
                        q_.put(None, timeout=5)
                    except Exception:
                        pass

        feeder_t = threading.Thread(target=feeder, daemon=True)
        feeder_t.start()
        received = [0] * W

        import atexit

        def cleanup():
            cancel.set()
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)
            for q_ in in_qs + out_qs:
                q_.cancel_join_thread()
            for s in shms:
                try:
                    s.close()
                    s.unlink()
                except Exception:
                    pass

        def unpack(w, item):
            if isinstance(item, tuple) and len(item) == 6 and item[0] == "shm":
                _, slot, seq, shape, dtype, batch = item
                stride = shms[w].size // shm_slots
                stamp = np.ndarray((), np.int64, buffer=shms[w].buf,
                                   offset=slot * stride)
                view = np.ndarray(shape, np.dtype(dtype), buffer=shms[w].buf,
                                  offset=slot * stride + _SHM_STAMP_BYTES)
                # Copy out before yielding: the slot may be rewritten as soon
                # as the worker's queue drains (ring-reuse contract above).
                # The stamp is checked on BOTH sides of the copy: the worker
                # writes stamp-then-image, so a lap flips the stamp before
                # any new image byte lands — either check firing means the
                # qsize+3 no-lap bound was broken by a future change, and we
                # fail loudly instead of training on torn images.
                if int(stamp) != seq:
                    raise RuntimeError(
                        f"shm ring lapped: worker {w} slot {slot} holds seq "
                        f"{int(stamp)}, expected {seq} (pre-copy)"
                    )
                batch["image"] = np.array(view)
                if int(stamp) != seq:
                    raise RuntimeError(
                        f"shm ring lapped during copy-out: worker {w} slot "
                        f"{slot} now holds seq {int(stamp)}, expected {seq}"
                    )
                return batch
            return item

        atexit.register(cleanup)
        try:
            w = 0
            while True:
                try:
                    item = out_qs[w].get(timeout=0.2)
                except queue.Empty:
                    if (done_feeding.is_set() and received[w] >= sent[w]
                            and not feeder_t.is_alive()):
                        if feeder_error[0] is not None:
                            raise feeder_error[0]
                        return  # finite sampler exhausted
                    if not procs[w].is_alive():
                        raise RuntimeError(
                            f"loader worker {w} died (exit {procs[w].exitcode})"
                        )
                    continue
                received[w] += 1
                if isinstance(item, Exception):
                    raise item
                yield unpack(w, item)
                w = (w + 1) % W
        finally:
            cleanup()
            atexit.unregister(cleanup)


def device_prefetch_stacked(iterator, mesh, steps_per_dispatch: int, size: int = 2):
    """Like `device_prefetch`, but groups `steps_per_dispatch` host batches
    into one stacked device batch (leading dims (K, B, ...)) for the
    multi-step scan dispatch (`PoseTrainer.train_step_multi`). A trailing
    group smaller than K is dropped (the sampler streams are infinite in
    training; only bounded smoke runs can hit this)."""
    import collections

    import jax

    from neuralnet_tracker_traincode_tpu.parallel.mesh import shard_stacked_batch

    k = int(steps_per_dispatch)

    def stacked():
        it = iter(iterator)
        while True:
            group = []
            try:
                for _ in range(k):
                    group.append(next(it))
            except StopIteration:
                return
            yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *group)

    buf = collections.deque()
    it = stacked()
    try:
        for _ in range(size):
            buf.append(shard_stacked_batch(next(it), mesh))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(shard_stacked_batch(next(it), mesh))
        except StopIteration:
            pass
        yield out


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
