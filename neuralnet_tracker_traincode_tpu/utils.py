"""Host-side utilities: euler conversions, iteration helpers, HDF5 globbing.

Contract: `trackertraincode/utils.py`.
"""

import fnmatch
import os
from os.path import splitext
from typing import Any, Dict, List

import numpy as np
from scipy.spatial.transform import Rotation

rad2deg = 180.0 / np.pi
deg2rad = np.pi / 180.0


def identity(arg):
    return arg


def as_hpb(rot: Rotation) -> np.ndarray:
    """Aeronautic-like convention: extrinsic roll (fwd), pitch (lateral), heading (vertical)."""
    return rot.as_euler("YXZ")


def from_hpb(hpb) -> Rotation:
    return Rotation.from_euler("YXZ", hpb)


def convert_to_rot(net_output: np.ndarray) -> Rotation:
    return Rotation.from_quat(net_output)


_P = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, -1]], dtype=np.float64)


def aflw_rotation_conversion(pitch, yaw, roll) -> Rotation:
    """Euler angles -> Rotation, as used for AFLW / 300W-LP annotations."""
    rot = Rotation.from_euler("XYZ", np.asarray([pitch, -np.asarray(yaw), roll]).T)
    M = rot.as_matrix()
    M = _P @ M @ _P.T
    return Rotation.from_matrix(M)


def inv_aflw_rotation_conversion(rot: Rotation) -> np.ndarray:
    """Rotation -> (pitch, yaw, roll) euler angles of the AFLW convention.

    Vectorized over batched Rotation objects; returns shape (..., 3).
    """
    M = _P @ rot.as_matrix() @ _P.T
    euler = Rotation.from_matrix(M).as_euler("XYZ")
    euler = euler * np.asarray([1.0, -1.0, 1.0])
    return euler


def affine3d_chain(Ta, Tb):
    Ra, ta = Ta
    Rb, tb = Tb
    return Ra * Rb, Ra.as_matrix().dot(tb) + ta


def affine3d_inv(Ta):
    Ra, ta = Ta
    RaInv = Ra.inv()
    return RaInv, -RaInv.as_matrix().dot(ta)


def iter_batched(iterable, batchsize):
    import h5py

    if isinstance(iterable, (h5py.Dataset, np.ndarray)):
        for i in range(0, iterable.shape[0], batchsize):
            yield iterable[i : i + batchsize, ...]
    else:
        it = iter(iterable)
        while True:
            ret = [x for _, x in zip(range(batchsize), it)]
            if not ret:
                break
            yield ret


def cycle(iterable):
    """Like itertools.cycle but without caching the first pass."""
    iterator = iter(iterable)
    while True:
        try:
            yield next(iterator)
        except StopIteration:
            iterator = iter(iterable)
            try:
                yield next(iterator)
            except StopIteration:
                # An empty iterable would otherwise spin this loop forever
                # (observed: an empty train split hanging the sampler).
                raise ValueError("cycle() over an empty iterable")


def replace_ext(filename, replacement):
    basename, _ = splitext(filename)
    return basename + replacement


def num_workers() -> int:
    return int(os.environ.get("NUM_WORKERS", 4))


def copy_attributes(src, dst):
    for k, v in src.attrs.items():
        dst.attrs[k] = v


def iter_hdf_datasets(x):
    import h5py

    if isinstance(x, h5py.Group):
        for v in x.values():
            yield from iter_hdf_datasets(v)
    else:
        yield x


def glob_hdf_datasets(f, patterns: List[str]):
    it = iter_hdf_datasets(f)
    matcher = lambda ds: any(fnmatch.fnmatch(ds.name, pattern) for pattern in patterns)
    yield from filter(matcher, it)


def list_of_dicts_to_dict_of_lists(lod: List[Dict[Any, Any]]) -> Dict[Any, List[Any]]:
    if not lod:
        return {}
    first = next(iter(lod))
    return {k: [items[k] for items in lod] for k in first.keys()}


def enable_persistent_compile_cache(path: str = None) -> str:
    """Point JAX at an on-disk compilation cache (repeat CLI runs skip the
    20 s-10 min XLA:TPU compiles; `bench.py` uses the same directory)."""
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.realpath(__file__))),
                            ".cache", "jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    return path


def ceil_to_multiple(n: int, multiple: int = 64) -> int:
    """Round up to a multiple (shared padding-bucket granularity for the
    train loader, the eval predictor and the pad-size probe)."""
    return int(-(-int(n) // multiple) * multiple)
