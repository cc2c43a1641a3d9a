"""Native (C++) runtime components with ctypes bindings.

`tar_reader`: indexed tar-shard reading for the input pipeline (one pread per
member, no per-member Python object churn). Built on first use with g++ -O3 and
cached next to the source; the pure-Python tarfile path remains the fallback
(data/datasets.py uses it automatically when the native library is unavailable).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, List, Optional, Tuple

_SRC = os.path.join(os.path.dirname(__file__), "tar_reader.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_tar_reader.so")
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _LIB],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:  # no compiler / sandboxed build: fall back to Python
            print(f"[native] tar_reader build failed ({e}); using Python tarfile")
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.tar_open.argtypes = [ctypes.c_char_p]
    lib.tar_open.restype = ctypes.c_int64
    lib.tar_num_members.argtypes = [ctypes.c_int64]
    lib.tar_num_members.restype = ctypes.c_int64
    lib.tar_member_name.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_char_p, ctypes.c_int64]
    lib.tar_member_name.restype = ctypes.c_int64
    lib.tar_member_size.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.tar_member_size.restype = ctypes.c_int64
    lib.tar_read_member.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.tar_read_member.restype = ctypes.c_int64
    lib.tar_close.argtypes = [ctypes.c_int64]
    lib.tar_close.restype = None
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeTarFile:
    """Indexed random-access tar reader backed by the C++ library."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tar reader unavailable")
        self._lib = lib
        self._handle = lib.tar_open(path.encode())
        if self._handle < 0:
            raise IOError(f"cannot open tar {path}")
        self._names: Optional[List[str]] = None

    @property
    def names(self) -> List[str]:
        if self._names is None:
            n = self._lib.tar_num_members(self._handle)
            out = []
            buf = ctypes.create_string_buffer(4096)
            for i in range(n):
                ln = self._lib.tar_member_name(self._handle, i, buf, 4096)
                if ln >= 0:
                    out.append(buf.value.decode())
            self._names = out
        return self._names

    def read(self, index: int) -> bytes:
        size = self._lib.tar_member_size(self._handle, index)
        if size < 0:
            raise IndexError(index)
        buf = (ctypes.c_uint8 * size)()
        n = self._lib.tar_read_member(self._handle, index, buf, size)
        if n != size:
            raise IOError(f"short read {n} != {size}")
        return bytes(buf)

    def close(self):
        if self._handle >= 0:
            self._lib.tar_close(self._handle)
            self._handle = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_tar_samples(path: str) -> Iterator[Dict[str, bytes]]:
    """Drop-in replacement for datasets._tar_samples (webdataset key grouping)."""
    with NativeTarFile(path) as tf:
        current_key = None
        current: Dict[str, bytes] = {}
        for i, name in enumerate(tf.names):
            base = os.path.basename(name)
            key, _, rest = base.partition(".")
            if current_key is not None and key != current_key:
                yield {"__key__": current_key, **current}
                current = {}
            current_key = key
            current[rest] = tf.read(i)
        if current_key is not None:
            yield {"__key__": current_key, **current}
