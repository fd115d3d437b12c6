"""ctypes binding for the C++ tar-shard streamer (csrc/tarloader.cpp).

Build with ``make -C csrc``; ``native_available()`` reports whether the shared
library is present. ``NativeTarStream`` yields the same sample dicts as the pure
Python ``iterate_tar_samples`` so the Text2ImageDataset can swap backends.
"""
from __future__ import annotations

import ctypes
import os
import struct
from typing import Dict, Iterator, Optional, Sequence

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                         "libtarloader.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    lib.tls_open.restype = ctypes.c_void_p
    lib.tls_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                             ctypes.c_uint, ctypes.c_int, ctypes.c_int]
    lib.tls_next.restype = ctypes.c_long
    lib.tls_next.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
    lib.tls_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
    lib.tls_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _parse_blob(raw: bytes) -> Dict:
    off = 0
    (key_len,) = struct.unpack_from("<H", raw, off)
    off += 2
    key = raw[off:off + key_len].decode("utf-8", "replace")
    off += key_len
    (n_parts,) = struct.unpack_from("<H", raw, off)
    off += 2
    sample: Dict = {"__key__": key}
    for _ in range(n_parts):
        (ext_len,) = struct.unpack_from("<H", raw, off)
        off += 2
        ext = raw[off:off + ext_len].decode("utf-8", "replace")
        off += ext_len
        (data_len,) = struct.unpack_from("<I", raw, off)
        off += 4
        sample[ext.lower()] = raw[off:off + data_len]
        off += data_len
    return sample


class NativeTarStream:
    """Background-threaded multi-shard sample stream (C++ core)."""

    def __init__(self, shards: Sequence[str], seed: int = 0, resample: bool = False,
                 queue_cap: int = 64):
        lib = _load()
        if lib is None:
            raise RuntimeError("libtarloader.so not built; run make -C csrc")
        arr = (ctypes.c_char_p * len(shards))(*[s.encode() for s in shards])
        self._lib = lib
        self._h = lib.tls_open(arr, len(shards), seed & 0xFFFFFFFF,
                               1 if resample else 0, queue_cap)
        if not self._h:
            raise RuntimeError("tls_open failed")

    def __iter__(self) -> Iterator[Dict]:
        ptr = ctypes.POINTER(ctypes.c_ubyte)()
        while True:
            size = self._lib.tls_next(self._h, ctypes.byref(ptr))
            if size <= 0:
                return
            raw = ctypes.string_at(ptr, size)
            self._lib.tls_free(ptr)
            yield _parse_blob(raw)

    def close(self):
        if self._h:
            self._lib.tls_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
