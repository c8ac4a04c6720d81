r"""Pure-Python reader for PyTorch checkpoint files.

Reads both serialization formats ``torch.save`` has used — the zip container
(torch >= 1.6) and the legacy sequential-pickle stream — into numpy arrays
(``ml_dtypes`` for bfloat16) through a restricted unpickler, so pretrained
loading needs **no torch at runtime**. The reference loads checkpoints with
``torch.load`` (`azula/plugins/adm/__init__.py:150-154`, `azula/hub.py:78-81`);
here the same files are decoded from their on-disk layout directly:

- **zip format**: the archive holds ``<name>/data.pkl`` (the object pickle,
  tensors referenced by persistent id) and ``<name>/data/<key>`` members with
  the raw little-endian storage bytes.
- **legacy format**: a magic-number pickle, a protocol pickle, a sys-info
  pickle, the object pickle, the list of storage keys, then for each key an
  int64 element count followed by the raw storage bytes.

Only what a ``weights_only=True`` checkpoint can contain is allowed —
containers, primitives, and tensor/storage reconstruction. Any other global
raises :class:`pickle.UnpicklingError`, mirroring torch's own restricted
unpickler.
"""

from __future__ import annotations

__all__ = [
    "load_pt",
    "RestrictedUnpickler",
]

import io
import numpy as np
import pickle
import zipfile

import ml_dtypes

_MAGIC = 0x1950A86A20F9469CFC6C

# Storage-class marker -> numpy dtype. Torch pickles reference the legacy
# typed-storage classes (FloatStorage & co.) regardless of the torch version
# that wrote the file.
_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype(np.float64),
    "FloatStorage": np.dtype(np.float32),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": np.dtype(ml_dtypes.bfloat16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
    "ComplexFloatStorage": np.dtype(np.complex64),
    "ComplexDoubleStorage": np.dtype(np.complex128),
}


class _StorageType:
    r"""Stand-in for a ``torch.<X>Storage`` global inside a pickle."""

    def __init__(self, dtype: np.dtype) -> None:
        self.dtype = dtype


class _Storage:
    r"""A flat typed buffer. ``array`` is filled immediately (zip format) or
    in place after the object pickle (legacy format) — tensor views built
    during unpickling observe the later fill because they alias it."""

    def __init__(self, dtype: np.dtype, numel: int) -> None:
        self.dtype = dtype
        self.array = np.empty(numel, dtype=dtype)

    def fill(self, raw: bytes) -> None:
        self.array[:] = np.frombuffer(raw, dtype=self.dtype, count=len(self.array))

    def view(self, offset: int, numel: int) -> "_Storage":
        out = _Storage.__new__(_Storage)
        out.dtype = self.dtype
        out.array = self.array[offset : offset + numel]
        return out


def _rebuild_tensor(storage: _Storage, offset: int, size, stride) -> np.ndarray:
    itemsize = storage.dtype.itemsize
    return np.lib.stride_tricks.as_strided(
        storage.array[offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )


def _rebuild_tensor_v2(
    storage, offset, size, stride, requires_grad=False, hooks=None, metadata=None
) -> np.ndarray:
    return _rebuild_tensor(storage, offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, hooks=None):
    return data


def _load_from_bytes(b: bytes):
    r"""``torch.storage._load_from_bytes``: a whole legacy-format file whose
    object is a single storage (how plain-pickled tensors embed their data)."""

    return _legacy_load(io.BytesIO(b))


# (module, name) -> replacement. The unpickler resolves tensor machinery to
# the numpy implementations above and container/numpy types to the originals.
_ALLOWED = {
    ("collections", "OrderedDict"): __import__("collections").OrderedDict,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch.storage", "_load_from_bytes"): _load_from_bytes,
    ("torch", "Size"): tuple,
    ("torch.serialization", "_get_layout"): lambda name: None,
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
}

_NUMPY_ALLOWED = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
}


class RestrictedUnpickler(pickle.Unpickler):
    r"""Unpickler restricted to checkpoint content.

    Tensor/storage globals resolve to the numpy reconstruction functions;
    numpy and stdlib-container globals to themselves; anything else raises.
    Subclasses may extend :meth:`find_class` (e.g. the NVlabs persistence
    hooks in :mod:`azula_tpu.models.edm.convert`).
    """

    def find_class(self, module: str, name: str):
        if (module, name) in _ALLOWED:
            return _ALLOWED[module, name]

        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(_STORAGE_DTYPES[name])

        if (module, name) in _NUMPY_ALLOWED:
            import importlib

            return getattr(importlib.import_module(module), name)

        raise pickle.UnpicklingError(
            f"global '{module}.{name}' is not allowed in a weights checkpoint"
        )


class _ZipUnpickler(RestrictedUnpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str) -> None:
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix
        self._cache: dict[str, _Storage] = {}

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid[:5]
        assert kind == "storage", kind

        if key not in self._cache:
            storage = _Storage(storage_type.dtype, numel)
            storage.fill(self._zf.read(f"{self._prefix}data/{key}"))
            self._cache[key] = storage

        return self._cache[key]


class _LegacyUnpickler(RestrictedUnpickler):
    def __init__(self, file) -> None:
        super().__init__(file)
        self.roots: dict[str, _Storage] = {}

    def persistent_load(self, pid):
        kind, storage_type, root_key, _location, numel = pid[:5]
        view_metadata = pid[5] if len(pid) > 5 else None
        assert kind == "storage", kind

        if root_key not in self.roots:
            self.roots[root_key] = _Storage(storage_type.dtype, numel)

        root = self.roots[root_key]

        if view_metadata is not None:
            _view_key, offset, view_numel = view_metadata
            return root.view(offset, view_numel)

        return root


def _legacy_load(f):
    magic = pickle.load(f)
    if magic != _MAGIC:
        raise pickle.UnpicklingError(f"not a torch legacy file (magic {magic:#x})")

    pickle.load(f)  # protocol version
    pickle.load(f)  # sys info (endianness, type sizes)

    unpickler = _LegacyUnpickler(f)
    result = unpickler.load()

    keys = pickle.load(f)

    for key in keys:
        (numel,) = np.frombuffer(f.read(8), dtype="<i8")
        storage = unpickler.roots[key]
        storage.fill(f.read(int(numel) * storage.dtype.itemsize))

    return result


def load_pt(path: str):
    r"""Loads a PyTorch checkpoint (either serialization format) into numpy
    arrays, without torch.

    Equivalent to ``torch.load(path, weights_only=True, map_location="cpu")``
    with tensors as :class:`numpy.ndarray` (bfloat16 via ``ml_dtypes``).

    Arguments:
        path: The checkpoint file path.

    Returns:
        The deserialized object — typically a (nested) dict of arrays.
    """

    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
            pkl = next(n for n in names if n == "data.pkl" or n.endswith("/data.pkl"))
            prefix = pkl[: -len("data.pkl")]

            # Storages are decoded with native (little-endian) numpy dtypes;
            # a big-endian checkpoint would silently byte-swap every tensor.
            bo = next((n for n in names if n.rstrip("/").endswith("byteorder")), None)
            if bo is not None and zf.read(bo).strip() != b"little":
                raise ValueError(
                    f"{path}: big-endian checkpoints are not supported"
                )

            with zf.open(pkl) as f:
                return _ZipUnpickler(f, zf, prefix).load()

    with open(path, "rb") as f:
        return _legacy_load(f)
