"""Feature stores: key -> (L, D) float array.

The reference keeps clip features in LMDB databases of compressed npz blobs
and additionally caches every video in a Python dict of torch tensors
(cone/ego4d_mad_dataloader.py:73-111). Here the canonical on-disk format is
the *packed store* (.cfs): one contiguous mmap-able matrix plus a key index,
so a video's rows can be sliced zero-copy by any reader (numpy mmap now; the
native C++ prefetching reader in native/feature_store.cpp uses the same
format). LMDB remains supported behind an optional import for ingesting
reference-produced databases (`python -m cone_tpu.cli convert-store
--format lmdb`).

Packed store layout (little-endian):
    magic  b"CFST"  | version u32 | dim u32 | dtype u8 (0=f32,1=f16) |
    n_entries u64   | index_offset u64 | payload rows | index
    index entry: key_len u16 | key utf-8 | row_start u64 | n_rows u64
"""

from __future__ import annotations

import io
import struct
from typing import Dict, Iterable, Protocol, Tuple

import numpy as np

_MAGIC = b"CFST"
_DTYPES = {0: np.float32, 1: np.float16}
_DTYPE_IDS = {np.dtype(np.float32): 0, np.dtype(np.float16): 1}


class FeatureStore(Protocol):
    def get(self, key: str) -> np.ndarray: ...
    def keys(self) -> Iterable[str]: ...
    def __contains__(self, key: str) -> bool: ...


class InMemoryArrayStore:
    """Dict-backed store — test double for the on-disk stores (the
    'fake in-memory feature store' of SURVEY.md §4)."""

    def __init__(self, data: Dict[str, np.ndarray]):
        self._data = data

    def get(self, key: str) -> np.ndarray:
        return self._data[key]

    def keys(self):
        return self._data.keys()

    def __contains__(self, key):
        return key in self._data


def write_packed_store(path: str, items: Dict[str, np.ndarray]) -> None:
    """Write a packed .cfs store. All arrays must share dim and dtype."""
    arrays = {k: np.ascontiguousarray(v) for k, v in items.items()}
    if not arrays:
        raise ValueError(
            f"refusing to write an empty store to {path} — no feature"
            " arrays (empty/filtered source?)")
    first = next(iter(arrays.values()))
    dim = first.shape[-1]
    dtype = first.dtype
    assert all(a.shape[-1] == dim and a.dtype == dtype for a in arrays.values())

    payload = io.BytesIO()
    index = []
    row = 0
    for key, arr in arrays.items():
        n = arr.shape[0] if arr.ndim == 2 else 1
        payload.write(arr.tobytes())
        index.append((key, row, n))
        row += n

    body = payload.getvalue()
    header_size = 4 + 4 + 4 + 1 + 8 + 8
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<IIBQQ", 1, dim, _DTYPE_IDS[np.dtype(dtype)],
                            len(index), header_size + len(body)))
        f.write(body)
        for key, start, n in index:
            kb = key.encode()
            f.write(struct.pack("<H", len(kb)))
            f.write(kb)
            f.write(struct.pack("<QQ", start, n))


class PackedArrayStore:
    """mmap-backed reader for the packed .cfs format (zero-copy slicing)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(4)
            assert magic == _MAGIC, f"not a packed store: {path}"
            version, dim, dt, n_entries, index_offset = struct.unpack(
                "<IIBQQ", f.read(25)
            )
            assert version == 1
            self.dim = dim
            self.dtype = _DTYPES[dt]
            f.seek(index_offset)
            self._index: Dict[str, Tuple[int, int]] = {}
            for _ in range(n_entries):
                (klen,) = struct.unpack("<H", f.read(2))
                key = f.read(klen).decode()
                start, n = struct.unpack("<QQ", f.read(16))
                self._index[key] = (start, n)
        header_size = 29
        total_rows = (index_offset - header_size) // (dim * np.dtype(self.dtype).itemsize)
        self._mat = np.memmap(
            path, dtype=self.dtype, mode="r", offset=header_size,
            shape=(total_rows, dim),
        )

    def get(self, key: str) -> np.ndarray:
        start, n = self._index[key]
        return np.asarray(self._mat[start : start + n])

    def keys(self):
        return self._index.keys()

    def __contains__(self, key):
        return key in self._index


def open_array_store(path_or_dict) -> FeatureStore:
    if isinstance(path_or_dict, dict):
        return InMemoryArrayStore(path_or_dict)
    if str(path_or_dict).endswith(".cfs"):
        from cone_tpu.data import native_store

        if native_store.native_available():
            return native_store.NativePackedStore(str(path_or_dict))
        return PackedArrayStore(path_or_dict)
    return LmdbArrayStore(path_or_dict)  # directory => reference LMDB


class LmdbArrayStore:
    """Reader for reference-produced LMDB feature databases (npz blobs keyed
    by id, 'features' array — cone/ego4d_mad_dataloader.py:284-302).
    Requires the optional `lmdb` package."""

    def __init__(self, path: str, array_key: str = "features"):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "lmdb not installed; convert the database to a packed .cfs "
                "store with `python -m cone_tpu.cli convert-store --format "
                "lmdb` on a host that has lmdb"
            ) from e
        self._env = lmdb.open(path, readonly=True, create=False, readahead=False)
        self._txn = self._env.begin(buffers=True)
        self.array_key = array_key

    def get(self, key: str) -> np.ndarray:
        dump = self._txn.get(key.encode())
        if dump is None:
            raise KeyError(key)  # dict-like contract, like every FeatureStore
        with io.BytesIO(dump) as reader:
            blob = np.load(reader, allow_pickle=True)
            return blob[self.array_key].astype(np.float32)

    def keys(self):  # pragma: no cover
        with self._env.begin() as txn:
            return [k.decode() for k, _ in txn.cursor()]

    def __contains__(self, key):
        return self._txn.get(key.encode()) is not None


class TextFeatureStore:
    """Query text features: per-query token matrix + holistic CLS vector.

    The reference stores both in one npz per query ('token_features' +
    'cls_features' or 'eot_features', cone/ego4d_mad_dataloader.py:258-282).
    Here they are two array stores (tokens: (Lq, D); cls: (1, D))."""

    def __init__(self, tokens: FeatureStore, cls: FeatureStore):
        self.tokens = tokens
        self.cls = cls

    def get_tokens(self, qid: str) -> np.ndarray:
        return self.tokens.get(qid)

    def get_cls(self, qid: str) -> np.ndarray:
        arr = self.cls.get(qid)
        return arr[0] if arr.ndim == 2 else arr
