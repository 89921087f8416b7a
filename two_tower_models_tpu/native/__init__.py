"""Native (C++) ingest helpers with pure-Python fallbacks.

The reference is 100% Python (SURVEY §2.5) and assumes pre-hashed integer
ids — every model constructor takes ``*_hash_size``
(two_tower_base_retrieval.py:58-63) but nothing produces the hashes.  Real
ingest maps raw entity keys (64-bit surrogate ids or strings) onto table
slots on the HOST, outside the jit graph; this module supplies that step as
a released-GIL C++ batch kernel (ctypes, compiled on first use) so the feed
thread never bottlenecks the device, with a numpy fallback when no C++
toolchain is available.

The hash is an xxHash64-style avalanche mix — stable across processes and
platforms, which checkpointed embedding tables require (Python's ``hash``
is salted per process).  ``hash_ids`` (uint64 keys) and ``hash_strings``
(byte/str keys) both return int32 slot ids in [0, table_size).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "hashing.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_hashing.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        for cxx in ("c++", "g++", "clang++"):
            tmp_name = None
            try:
                with tempfile.NamedTemporaryFile(
                    suffix=".so", dir=os.path.dirname(_LIB_PATH), delete=False
                ) as tmp:
                    tmp_name = tmp.name
                subprocess.run(
                    [cxx, "-O3", "-shared", "-fPIC", "-o", tmp_name, _SRC],
                    check=True, capture_output=True,
                )
                os.replace(tmp_name, _LIB_PATH)  # atomic under concurrency
                break
            except (subprocess.CalledProcessError, FileNotFoundError, OSError):
                # includes read-only package dirs: tempfile creation itself
                # may fail before tmp_name is set — fall back to numpy
                if tmp_name is not None:
                    try:
                        os.unlink(tmp_name)
                    except OSError:
                        pass
                continue
        else:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hash_ids_u64.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.hash_ids_bytes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None:
        _lib = _build()
    return _lib


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> np.uint64(33))
    x = x * _P2
    x = x ^ (x >> np.uint64(29))
    x = x * _P3
    return x ^ (x >> np.uint64(32))


def _hash_u64_np(keys: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized numpy twin of the C++ hash (bit-identical; tested)."""
    h = np.uint64(seed) + _P1
    h = h ^ _mix64(keys * _P2)
    return _mix64(_rotl(h, 27) * _P1 + _P2)


def hash_ids(
    ids, table_size: int, seed: int = 0, force_fallback: bool = False
) -> np.ndarray:
    """Raw uint64 entity ids -> int32 table slots in [0, table_size)."""
    keys = np.ascontiguousarray(np.asarray(ids, dtype=np.uint64).reshape(-1))
    lib = None if force_fallback else _get_lib()
    if lib is not None:
        out = np.empty(keys.shape, np.uint32)
        lib.hash_ids_u64(
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            keys.size, seed, table_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
    else:
        with np.errstate(over="ignore"):
            out = (_hash_u64_np(keys, seed) % np.uint64(table_size)).astype(np.uint32)
    return out.astype(np.int32).reshape(np.asarray(ids).shape)


def hash_strings(
    keys: Sequence[str | bytes], table_size: int, seed: int = 0,
    force_fallback: bool = False,
) -> np.ndarray:
    """String/bytes entity keys -> int32 table slots in [0, table_size)."""
    for k in keys:
        if not isinstance(k, (str, bytes)):
            # bytes(int) would allocate that many ZERO bytes — an int key
            # here is a routing bug (use hash_ids), never a valid encoding
            raise TypeError(f"hash_strings takes str/bytes keys, got {type(k)}")
    raw = [k.encode() if isinstance(k, str) else bytes(k) for k in keys]
    lib = None if force_fallback else _get_lib()
    if lib is not None:
        blob = np.frombuffer(b"".join(raw), np.uint8) if raw else np.empty(0, np.uint8)
        blob = np.ascontiguousarray(blob)
        offsets = np.zeros(len(raw) + 1, np.int64)
        np.cumsum([len(r) for r in raw], out=offsets[1:])
        out = np.empty(len(raw), np.uint32)
        lib.hash_ids_bytes(
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(raw), seed, table_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return out.astype(np.int32)
    # Python twin of the C++ byte hash (bit-identical; tested).
    out = np.empty(len(raw), np.int32)
    with np.errstate(over="ignore"):
        for i, r in enumerate(raw):
            h = np.uint64(seed) + _P1 + np.uint64(len(r))
            j = 0
            while j + 8 <= len(r):
                w = np.uint64(int.from_bytes(r[j : j + 8], "little"))
                h = _rotl(h ^ _mix64(w * _P2), 27) * _P1 + _P2
                j += 8
            tail = np.uint64(int.from_bytes(r[j:], "little")) if j < len(r) else np.uint64(0)
            h = _rotl(h ^ _mix64(tail * _P2), 27) * _P1 + _P2
            out[i] = int(_mix64(h) % np.uint64(table_size))
    return out


def native_available() -> bool:
    return _get_lib() is not None
