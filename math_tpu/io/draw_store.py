"""ctypes bindings for the native C++ draw store (``native/draw_store.cc``).

The shared library is built on demand with g++ (cached beside the source);
if no C++ toolchain is available, a pure-numpy fallback implements the same
file format so the API always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmathtpu_io.so"))

_MAGIC = b"MTDS"
_HEADER = np.dtype(
    [
        ("magic", "S4"),
        ("version", "<u4"),
        ("dtype", "<u4"),
        ("pad", "<u4"),
        ("n_chains", "<u8"),
        ("dim", "<u8"),
    ]
)


def _build_native() -> Optional[ctypes.CDLL]:
    src = os.path.join(_NATIVE_DIR, "draw_store.cc")
    if not os.path.exists(src):
        return None
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(src) > os.path.getmtime(
        _LIB_PATH
    ):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mtds_writer_open.restype = ctypes.c_void_p
    lib.mtds_writer_open.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_uint32,
    ]
    lib.mtds_writer_append.restype = ctypes.c_int
    lib.mtds_writer_append.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_uint64,
    ]
    lib.mtds_writer_close.argtypes = [ctypes.c_void_p]
    lib.mtds_read_meta.restype = ctypes.c_int
    lib.mtds_read_meta.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.mtds_read_all.restype = ctypes.c_int64
    lib.mtds_read_all.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    return lib


_lib = _build_native()


def native_available() -> bool:
    return _lib is not None


class DrawStore:
    """Append-only crash-safe draw log: (n_draws, n_chains, dim) arrays."""

    def __init__(self, path: str, n_chains: int, dim: int, dtype=np.float32):
        self.path = path
        self.n_chains = int(n_chains)
        self.dim = int(dim)
        self.dtype = np.dtype(dtype)
        if self.dtype.itemsize not in (4, 8):
            raise ValueError("dtype must be float32 or float64")
        self._handle = None
        self._file = None
        if _lib is not None:
            self._handle = _lib.mtds_writer_open(
                path.encode(), self.n_chains, self.dim, self.dtype.itemsize
            )
            if not self._handle:
                raise OSError(f"cannot open draw store {path}")
        else:
            self._file = open(path, "ab")
            if self._file.tell() == 0:
                h = np.zeros((), _HEADER)
                h["magic"] = _MAGIC
                h["version"] = 1
                h["dtype"] = self.dtype.itemsize
                h["n_chains"] = self.n_chains
                h["dim"] = self.dim
                self._file.write(h.tobytes())
                self._file.flush()

    def append(self, draws) -> None:
        """draws: (n_draws, n_chains, dim) array."""
        arr = np.ascontiguousarray(draws, dtype=self.dtype)
        if arr.ndim != 3 or arr.shape[1:] != (self.n_chains, self.dim):
            raise ValueError(
                f"expected (n, {self.n_chains}, {self.dim}), got {arr.shape}"
            )
        n = arr.shape[0]
        if self._handle is not None:
            rc = _lib.mtds_writer_append(
                self._handle, arr.ctypes.data_as(ctypes.c_void_p), n
            )
            if rc != 0:
                raise OSError(f"draw store append failed rc={rc}")
        else:
            payload = arr.tobytes()
            self._file.write(np.uint64(n).tobytes())
            self._file.write(payload)
            self._file.write(np.uint32(zlib.crc32(payload)).tobytes())
            self._file.flush()

    def close(self) -> None:
        if self._handle is not None:
            _lib.mtds_writer_close(self._handle)
            self._handle = None
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_draws(path: str) -> np.ndarray:
    """Read all complete chunks; returns (n_draws, n_chains, dim)."""
    if _lib is not None:
        nc = ctypes.c_uint64()
        dim = ctypes.c_uint64()
        es = ctypes.c_uint32()
        nd = ctypes.c_uint64()
        rc = _lib.mtds_read_meta(
            path.encode(), ctypes.byref(nc), ctypes.byref(dim), ctypes.byref(es),
            ctypes.byref(nd),
        )
        if rc != 0:
            raise OSError(f"cannot read draw store {path} rc={rc}")
        dt = np.float32 if es.value == 4 else np.float64
        out = np.empty((nd.value, nc.value, dim.value), dtype=dt)
        got = _lib.mtds_read_all(path.encode(), out.ctypes.data_as(ctypes.c_void_p))
        if got < 0:
            raise OSError(f"draw store read failed rc={got}")
        return out[: int(got)]
    # numpy fallback
    with open(path, "rb") as f:
        h = np.frombuffer(f.read(_HEADER.itemsize), _HEADER)[0]
        if bytes(h["magic"]) != _MAGIC:
            raise OSError("bad draw store header")
        dt = np.float32 if h["dtype"] == 4 else np.float64
        rec = int(h["n_chains"]) * int(h["dim"]) * int(h["dtype"])
        chunks = []
        while True:
            head = f.read(8)
            if len(head) < 8:
                break
            n = int(np.frombuffer(head, "<u8")[0])
            payload = f.read(n * rec)
            crc_b = f.read(4)
            if len(payload) < n * rec or len(crc_b) < 4:
                break
            if zlib.crc32(payload) != int(np.frombuffer(crc_b, "<u4")[0]):
                break
            chunks.append(
                np.frombuffer(payload, dt).reshape(n, int(h["n_chains"]), int(h["dim"]))
            )
        if not chunks:
            return np.empty((0, int(h["n_chains"]), int(h["dim"])), dt)
        return np.concatenate(chunks, axis=0)
