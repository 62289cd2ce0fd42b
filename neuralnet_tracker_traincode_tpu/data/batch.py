"""Batch container: dict of arrays plus metadata, with tag-segmented collation.

Contract: `trackertraincode/datasets/batch.py`. Framework-agnostic: values can
be numpy arrays (host pipeline) or jax arrays (device pipeline). The reference's
import cycle (Batch re-exported through pipelines) is deliberately broken here —
Batch lives in the data layer only.
"""

import copy
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

Tag = Any


@dataclass
class Metadata:
    _imagesize: Union[int, Tuple[int, int]]
    batchsize: int
    tag: Optional[Any] = field(default=None)
    seq: Optional[List[int]] = field(default=None)
    categories: Dict[str, Any] = field(default_factory=dict)

    @property
    def image_wh(self):
        return (
            self._imagesize
            if isinstance(self._imagesize, tuple)
            else (self._imagesize, self._imagesize)
        )

    @property
    def imagesize(self):
        assert isinstance(self._imagesize, int)
        return self._imagesize

    @property
    def sequence_start_end(self):
        assert self.seq
        return list(zip(self.seq[:-1], self.seq[1:]))

    @property
    def prefixshape(self):
        return (self.seq[-1],) if self.seq else ((self.batchsize,) if self.batchsize else ())

    @property
    def is_single_frame(self):
        return self.seq is None and self.batchsize == 0


def _concat(arrays):
    first = arrays[0]
    if isinstance(first, np.ndarray):
        return np.concatenate(arrays, axis=0)
    import jax.numpy as jnp

    return jnp.concatenate(arrays, axis=0)


class Batch:
    """Dict of per-field arrays with shared Metadata."""

    def __init__(self, meta: Metadata, *data, **kwargs):
        self.meta: Metadata = meta
        self._data: Dict[str, Any] = dict(*data, **kwargs)

    @staticmethod
    def from_data_with_categories(meta: Metadata, *args, **kwargs):
        """Create Batch from a dict with (array, category) values."""
        with_categories = dict(*args, **kwargs)
        meta = copy.copy(meta)
        meta.categories = dict(meta.categories)
        meta.categories.update(((k, c) for k, (_, c) in with_categories.items()))
        return Batch(meta, ((k, v) for k, (v, _) in with_categories.items()))

    def items(self):
        return self._data.items()

    def __getitem__(self, k):
        return self._data[k]

    def __setitem__(self, k, v):
        self._data[k] = v

    def __delitem__(self, k):
        del self._data[k]

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def __contains__(self, k):
        return k in self._data

    def pop(self, k, *default):
        return self._data.pop(k, *default)

    def get(self, k, default=None):
        return self._data.get(k, default)

    def __str__(self):
        seq_str = f",N={self.meta.seq[-1]}" if self.meta.seq is not None else ""
        return f"Batch({self.meta.tag},B={self.meta.batchsize}{seq_str})"

    def get_category(self, k, default=None):
        assert k in self._data
        return self.meta.categories.get(k, default)

    def with_batchdim(self) -> "Batch":
        """View with batchsize >= 1, adding the batch dim to all arrays if absent."""
        if self.meta.batchsize > 0:
            return self
        meta = copy.copy(self.meta)
        meta.batchsize = max(meta.batchsize, 1)
        if self.meta.seq is not None:
            return Batch(meta, self.items())
        return Batch(meta, ((k, v[None, ...]) for k, v in self.items()))

    def iter_frames(self) -> Iterator["Batch"]:
        if self.meta.is_single_frame:
            yield self
        else:
            (n,) = self.meta.prefixshape
            meta = copy.copy(self.meta)
            meta.batchsize = 0
            meta.seq = None
            for i in range(n):
                yield Batch(meta, ((k, v[i, ...]) for k, v in self.items()))

    def iter_sequences(self) -> Iterator["Batch"]:
        assert self.meta.seq is not None
        for a, b in self.meta.sequence_start_end:
            meta = copy.copy(self.meta)
            meta.batchsize = 0
            meta.seq = [0, b - a]
            yield Batch(meta, ((k, v[a:b, ...]) for k, v in self.items()))

    def undo_collate(self) -> Iterator["Batch"]:
        if self.meta.seq:
            yield from self.iter_sequences()
        else:
            yield from self.iter_frames()

    def copy(self):
        """Shallow copy."""
        return Batch(copy.copy(self.meta), **self._data)

    def map_arrays(self, fn: Callable[[Any], Any]) -> "Batch":
        return Batch(copy.copy(self.meta), ((k, fn(v)) for k, v in self.items()))

    def to_numpy(self) -> "Batch":
        return self.map_arrays(lambda v: np.asarray(v))

    def to_device(self, device=None, sharding=None) -> "Batch":
        import jax

        kwargs = {}
        if sharding is not None:
            target = sharding
        elif device is not None:
            target = device
        else:
            target = None
        return self.map_arrays(lambda v: jax.device_put(v, target))

    class Collation:
        """Concatenate sample Batches; optionally grouped by a key (e.g. tag)."""

        def __init__(self, key_getter: Optional[Callable[["Batch"], Any]] = None):
            self._key_getter = key_getter if key_getter is not None else (lambda b: True)
            self._divide_samples = key_getter is not None

        def __call__(self, samples: List["Batch"]):
            divisions = defaultdict(list)
            for item in samples:
                assert isinstance(item, Batch), f"Expected list of Batch, got {type(item)}"
                divisions[self._key_getter(item)].append(item)
            batches = list(map(self._collate_single_class, divisions.values()))
            if not self._divide_samples:
                (batches,) = batches
            return batches

        def _collate_single_class(self, samples: List["Batch"]) -> "Batch":
            first = samples[0]
            collate = (
                self._collate_stills if first.meta.seq is None else self._collate_videos
            )
            return collate(samples, first)

        def _collate_videos(self, samples, first) -> "Batch":
            return Batch(
                self._combine_metadata(samples, first),
                self._combine_samples(samples, first).items(),
            )

        def _collate_stills(self, samples, first) -> "Batch":
            return Batch(
                self._combine_metadata(samples, first),
                self._combine_samples([s.with_batchdim() for s in samples], first),
            )

        def _combine_metadata(self, samples, first) -> Metadata:
            meta = copy.copy(first.meta)
            if first.meta.seq is None:
                meta.batchsize = sum(max(s.meta.batchsize, 1) for s in samples)
            else:
                lengths = np.asarray([0] + [s.meta.seq[-1] for s in samples])
                offsets = np.cumsum(lengths)[:-1]
                seq = np.concatenate(
                    [np.zeros((1,), dtype=np.int32)]
                    + [np.asarray(s.meta.seq[1:]) + o for s, o in zip(samples, offsets)]
                ).tolist()
                meta = copy.copy(first.meta)
                meta.batchsize = len(seq) - 1
                meta.seq = seq
            return meta

        def _combine_samples(self, samples, first) -> Dict[str, Any]:
            assert all(s.meta.prefixshape != () for s in samples)
            return {k: _concat([s[k] for s in samples]) for k in first.keys()}

    collate = None  # assigned below


Batch.collate = Batch.Collation()
