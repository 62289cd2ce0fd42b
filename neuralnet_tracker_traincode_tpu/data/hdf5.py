"""HDF5 storage wrappers: varsize JPEG/PNG buffers, external-file images,
min/max-quantized uint8 varsize arrays.

Contract: `trackertraincode/datasets/dshdf5.py`. Schema-compatible with the
reference's HDF5 files (same `storage` / `lossy` / `category` attributes), so
datasets produced by either codebase interoperate. All wrappers return numpy.
"""

from functools import cached_property
from os.path import basename, dirname, isfile, join, splitext
from typing import List, Optional, Tuple, Union

import h5py
import numpy as np
import PIL.Image

from neuralnet_tracker_traincode_tpu.data.preprocessing import (
    ImageFormat,
    imdecode,
    imencode,
    which_image_format,
)
from neuralnet_tracker_traincode_tpu.utils import glob_hdf_datasets

variable_length_hdf5_buffer_dtype = h5py.special_dtype(vlen=np.dtype("uint8"))


class DatasetEncoding:
    varsize_array_buffer = "varsize_array_buffer"
    varsize_image_buffer = "varsize_image_buffer"
    image_filename = "image_filename"


def _chunk_shape(shape, maxshape):
    _chunksize = 1024
    if shape is None:
        shape = maxshape
    n, rest = shape[0], shape[1:]
    return (min(_chunksize, n),) + rest


def _ensure_image_color_mode(img: np.ndarray, monochrome: bool) -> np.ndarray:
    assert not monochrome or img.ndim == 2
    assert monochrome or (img.ndim == 3 and img.shape[-1] == 3)
    return img


class ImageDs:
    def __init__(self):
        self.monochrome = True

    def _decode(self, buffer):
        if self.monochrome:
            # Native libjpeg path (grayscale decode skips chroma entirely);
            # bit-exact with cv2, falls back transparently.
            from neuralnet_tracker_traincode_tpu.data.native_loader import decode_jpeg_gray

            buf = np.asarray(buffer)
            if buf.size >= 3 and bytes(buf[:3].tobytes()) == b"\xff\xd8\xff":
                decoded = decode_jpeg_gray(buf)
                if decoded is not None:
                    return _ensure_image_color_mode(decoded, True)
        decoded = imdecode(buffer, color=False if self.monochrome else "rgb")
        return _ensure_image_color_mode(decoded, self.monochrome)

    def __getitem__(self, index: int) -> np.ndarray:
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError


def jpeg_dimensions(buf: np.ndarray):
    """(height, width) from the SOF marker of a JPEG buffer, or None."""
    b = memoryview(buf.tobytes() if isinstance(buf, np.ndarray) else buf)
    if len(b) < 4 or bytes(b[:2]) != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        length = (b[i + 2] << 8) | b[i + 3]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOFn
            h = (b[i + 5] << 8) | b[i + 6]
            w = (b[i + 7] << 8) | b[i + 8]
            return h, w
        i += 2 + length
    return None


class RawJpegBuffer:
    """Undecoded JPEG bytes standing in for a (h, w, 1) image array.

    Produced by the raw-image fast path (`use_raw_images`) so the loader can
    decode whole batches with the native threaded libjpeg pack instead of
    per-sample python calls. Exposes just enough array surface (.shape/.ndim)
    for size probing and metadata.
    """

    __slots__ = ("buffer", "height", "width")

    def __init__(self, buffer: np.ndarray, height: int, width: int):
        self.buffer = buffer
        self.height = height
        self.width = width

    @property
    def shape(self):
        return (self.height, self.width, 1)

    ndim = 3

    def decode(self) -> np.ndarray:
        from neuralnet_tracker_traincode_tpu.data.native_loader import decode_jpeg_gray

        decoded = decode_jpeg_gray(self.buffer)
        if decoded is None:
            decoded = imdecode(self.buffer, color=False)
        decoded = _ensure_image_color_mode(decoded, True)
        if decoded.ndim == 2:  # callers expect (h, w, 1)
            decoded = decoded[..., None]
        return decoded


class ImageVariableLengthBufferDs(ImageDs):
    """Images stored as variable-length encoded JPEG (lossy) / PNG buffers."""

    def __init__(self, ds: h5py.Dataset):
        super().__init__()
        if ds.attrs.get("lossy", True):
            self._format = ImageFormat.JPG
            self._encode = lambda value: imencode(value, format=ImageFormat.JPG, quality=95)
        else:
            self._format = ImageFormat.PNG
            self._encode = lambda value: imencode(value, format=ImageFormat.PNG)
        assert ds.attrs["storage"] == DatasetEncoding.varsize_image_buffer
        self.ds = ds

    def __getitem__(self, index: int):
        return self._decode(self.ds[index])

    def read_raw(self, index: int):
        """Raw varsize buffer without decoding (raw-image fast path)."""
        return np.asarray(self.ds[index])

    @property
    def is_jpeg(self) -> bool:
        return self._format == ImageFormat.JPG

    def __setitem__(self, index: int, value):
        assert (isinstance(value, np.ndarray) and value.dtype == np.uint8) or isinstance(
            value, PIL.Image.Image
        )
        if isinstance(value, PIL.Image.Image):
            value = np.asarray(value)
        if len(value.shape) in (2, 3):
            value = self._encode(value)
        else:
            if which_image_format(value) != self._format:
                raise ValueError(
                    f"Buffer for lossy/lossless data must be encoded as jpg/png, "
                    f"got {which_image_format(value)}"
                )
            assert len(value.shape) == 1
        self.ds[index] = value

    def __len__(self):
        return len(self.ds)

    def resize(self, size, axis):
        return self.ds.resize(size, axis)

    @cached_property
    def attrs(self):
        return self.ds.attrs

    @staticmethod
    def create(g: h5py.Group, name: str, size: int, maxsize: Optional[int] = None, lossy=True):
        ds = g.create_dataset(
            name,
            (size,),
            variable_length_hdf5_buffer_dtype,
            maxshape=(maxsize,),
            chunks=_chunk_shape((size,), (maxsize,)),
        )
        ds.attrs["storage"] = DatasetEncoding.varsize_image_buffer
        ds.attrs["lossy"] = lossy
        return ImageVariableLengthBufferDs(ds)


class ImagePathDs(ImageDs):
    """Images referenced by external filenames relative to the HDF5 file."""

    def __init__(self, ds: h5py.Dataset):
        super().__init__()
        assert ds.attrs["storage"] == DatasetEncoding.image_filename
        self._ds = ds
        self._filelist = ImagePathDs._find_filenames(ds)

    @staticmethod
    def _find_filenames(ds: h5py.Dataset):
        supported_extensions = (".jpg", ".png", ".jpeg")
        names = ds[...]
        first = names[0].decode("ascii")
        extensions_to_try = (
            supported_extensions
            if (splitext(first.lower())[1] not in supported_extensions)
            else ("",)
        )
        directories_to_try = [dirname(ds.file.filename), splitext(ds.file.filename)[0]]
        found = False
        for root_dir in directories_to_try:
            for ext in extensions_to_try:
                if isfile(join(root_dir, first + ext)):
                    found = True
                    break
            if found:
                break
        if not found:
            raise RuntimeError(
                f"Cannot find images for image path dataset. Looking for name {first} "
                f"with roots {directories_to_try} and extensions {extensions_to_try}"
            )
        return [join(root_dir, s.decode("ascii") + ext) for s in names]

    def __getitem__(self, index: int):
        with open(self._filelist[index], "rb") as f:
            buffer = f.read()
        return self._decode(buffer)

    def __len__(self):
        return len(self._filelist)

    @cached_property
    def attrs(self):
        return self._ds.attrs

    @staticmethod
    def create(g: h5py.Group, name, data):
        ds = g.create_dataset(name, data=data)
        ds.attrs["storage"] = DatasetEncoding.image_filename
        return ImagePathDs(ds)


def create_dataset(g: h5py.Group, name, shape=None, dtype=None, maxshape=None, data=None):
    if data is not None:
        data = np.asarray(data)
        assert shape is None or data.shape == shape
    if shape is None:
        assert data is not None
        shape = data.shape
    return g.create_dataset(
        name, shape, dtype, chunks=_chunk_shape(shape, maxshape), maxshape=maxshape, data=data
    )


def _quantize(values: np.ndarray):
    assert values.dtype in (np.float32, np.float64)
    minval = np.amin(values, keepdims=True)
    maxval = np.amax(values, keepdims=True)
    buffer = ((values - minval) / (maxval - minval + 1.0) * 256).astype(np.uint8)
    return np.squeeze(minval), np.squeeze(maxval), buffer


def _dequantize(minval, maxval, buffer, shape):
    buffer = buffer / 256.0 * (maxval - minval + 1) + minval
    return buffer.astype(np.float32).reshape(shape)


class QuantizedVarsizeArrayDs:
    """Float arrays stored min/max-quantized to uint8 with per-item shape."""

    def __init__(self, ds: h5py.Dataset):
        assert ds.attrs["storage"] == DatasetEncoding.varsize_array_buffer
        self.ds = ds

    def __getitem__(self, index: int):
        shape, minval, maxval, buffer = self.ds[index]
        buffer = np.frombuffer(buffer, dtype=np.uint8)
        return _dequantize(minval, maxval, buffer, shape)

    def __setitem__(self, index: int, value: np.ndarray):
        minval, maxval, buffer = _quantize(value)
        self.ds[index] = (value.shape, float(minval), float(maxval), buffer.ravel())

    @cached_property
    def attrs(self):
        return self.ds.attrs

    def __len__(self):
        return len(self.ds)

    def resize(self, size, axis):
        return self.ds.resize(size, axis)

    @staticmethod
    def create(g, name, size, sample_dimensionality, maxsize=None):
        dt = np.dtype(
            [
                ("shape", "i4", (sample_dimensionality,)),
                ("minval", "f4"),
                ("maxval", "f4"),
                ("buffer", variable_length_hdf5_buffer_dtype),
            ]
        )
        ds = g.create_dataset(
            name, (size,), chunks=_chunk_shape((size,), (maxsize,)), maxshape=(maxsize,), dtype=dt
        )
        ds.attrs["storage"] = DatasetEncoding.varsize_array_buffer
        return QuantizedVarsizeArrayDs(ds)


MaybeWrappedH5Dataset = Union[h5py.Dataset, QuantizedVarsizeArrayDs, ImageDs]
Whitelist = List[str]


def open_dataset(g: h5py.Group, name: str) -> MaybeWrappedH5Dataset:
    ds = g[name]
    if "storage" not in ds.attrs:
        return ds
    typeattr = ds.attrs["storage"]
    if typeattr == DatasetEncoding.varsize_array_buffer:
        return QuantizedVarsizeArrayDs(ds)
    if typeattr == DatasetEncoding.image_filename:
        return ImagePathDs(ds)
    if typeattr == DatasetEncoding.varsize_image_buffer:
        return ImageVariableLengthBufferDs(ds)
    raise RuntimeError(f"Unknown value of attribute 'storage': {typeattr}")


def open_all_datasets(root: h5py.Group, whitelist: Whitelist):
    opened = []
    for ds in glob_hdf_datasets(root, whitelist):
        opened.append((basename(ds.name), open_dataset(root, ds.name)))
    assert len(set(k for k, _ in opened)) == len(opened), "Dataset base names must be unique."
    return opened


class Hdf5DatasetBase:
    """Random-access view over the datasets of one HDF5 file.

    Lazily (re-)opens the file on first access so instances can be forked /
    pickled into worker processes safely (`dshdf5.py:311-316`).
    """

    def __init__(self, filename, monochrome=True, whitelist: Whitelist = None):
        import threading

        self.monochrome = monochrome
        self.filename = filename
        self.whitelist = whitelist
        self._h5file = None
        self._names_datasets = None
        self._open_lock = threading.Lock()
        with h5py.File(self.filename, "r") as f:
            self._init_from_file(f, whitelist)

    def _init_from_file(self, f: h5py.File, whitelist: Whitelist):
        names_datasets = open_all_datasets(f, whitelist)
        lengths = [len(v) for _, v in names_datasets]
        assert lengths and all(
            l == lengths[0] for l in lengths
        ), f"Inconsistent lengths among data: {[k for k, v in names_datasets]}"
        self._frame_count = lengths[0]
        return names_datasets

    @property
    def frame_count(self):
        return self._frame_count

    def __len__(self):
        return self.frame_count

    def _set_monochrome_flag_to_ds_wrappers(self, names_datasets=None):
        items = (names_datasets if names_datasets is not None else self._names_datasets).values()
        for ds in items:
            if isinstance(ds, ImageDs):
                ds.monochrome = self.monochrome

    def _ensure_h5opened(self):
        # Multi-worker loaders hit the first access concurrently; the lazy
        # open must be atomic or a second thread can observe _h5file set while
        # _names_datasets is still None (flaked in CI). _names_datasets is
        # assigned LAST, and the fast path only trusts it.
        if self._names_datasets is not None:
            return
        with self._open_lock:
            if self._names_datasets is not None:
                return
            h5file = h5py.File(self.filename, "r")
            names_datasets = dict(open_all_datasets(h5file, self.whitelist))
            # Fully configure the wrappers BEFORE publishing: the lock-free
            # fast path trusts _names_datasets as the ready signal.
            self._set_monochrome_flag_to_ds_wrappers(names_datasets)
            self._h5file = h5file
            self._names_datasets = names_datasets

    def _get_field(self, ds: MaybeWrappedH5Dataset, index: int):
        return np.asarray(ds[index])

    # When True, monochrome varsize-JPEG images are returned as RawJpegBuffer
    # (undecoded) so the batch loader can use the native threaded decode-pack.
    use_raw_images = False

    def __getitem__(self, index):
        if index < 0 or index >= len(self):
            raise IndexError(f"Index {index} on dataset of length {len(self)}")
        self._ensure_h5opened()
        out = []
        for name, dataset in self._names_datasets.items():
            if (
                self.use_raw_images
                and self.monochrome
                and isinstance(dataset, ImageVariableLengthBufferDs)
                and dataset.is_jpeg
            ):
                raw = dataset.read_raw(index)
                dims = jpeg_dimensions(raw)
                if dims is not None:
                    out.append((name, RawJpegBuffer(raw, dims[0], dims[1])))
                    continue
            out.append((name, self._get_field(dataset, index)))
        return out

    def close(self):
        with self._open_lock:  # serialize against a concurrent lazy open
            assert (self._h5file is None) == (self._names_datasets is None)
            if self._h5file is not None:
                self._h5file.close()
                self._h5file = None
                self._names_datasets = None

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_h5file"] = None
        state["_names_datasets"] = None
        state.pop("_open_lock", None)  # locks don't pickle
        return state

    def __setstate__(self, state):
        import threading

        self.__dict__.update(state)
        self._open_lock = threading.Lock()
