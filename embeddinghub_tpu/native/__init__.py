"""Native runtime bindings (ctypes over ``libehtpu.so``).

Builds lazily with g++ on first use (cached next to the source); all
callers degrade gracefully to pure-Python/numpy paths when a toolchain
is unavailable, so the package never hard-requires the .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libehtpu.so")
_SRC = os.path.join(_HERE, "engine.cpp")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def load() -> ctypes.CDLL | None:
    """The native library, building it on first call; None when the
    toolchain is unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        _configure(lib)
        _lib = lib
        return _lib


def build_error() -> str | None:
    return _build_error


def _configure(lib: ctypes.CDLL) -> None:
    c = ctypes
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.arena_create.restype = c.c_void_p
    lib.arena_create.argtypes = [c.c_int64, c.c_int64]
    lib.arena_free.argtypes = [c.c_void_p]
    lib.arena_capacity.restype = c.c_int64
    lib.arena_capacity.argtypes = [c.c_void_p]
    lib.arena_reserve.argtypes = [c.c_void_p, c.c_int64]
    lib.arena_set.argtypes = [c.c_void_p, i64p, f32p, c.c_int64]
    lib.arena_invalidate.argtypes = [c.c_void_p, i64p, c.c_int64]
    lib.arena_get.argtypes = [c.c_void_p, i64p, f32p, c.c_int64]
    lib.arena_data.restype = c.POINTER(c.c_float)
    lib.arena_data.argtypes = [c.c_void_p]
    lib.arena_valid.restype = c.POINTER(c.c_uint8)
    lib.arena_valid.argtypes = [c.c_void_p]
    lib.arena_save.restype = c.c_int
    lib.arena_save.argtypes = [c.c_void_p, c.c_char_p]
    lib.arena_load.restype = c.c_void_p
    lib.arena_load.argtypes = [c.c_char_p]

    lib.wal_append_set_batch.restype = c.c_int
    lib.wal_append_set_batch.argtypes = [
        c.c_char_p, c.c_char_p, i32p, f32p, c.c_int64, c.c_int64,
    ]
    lib.wal_count_records.restype = c.c_int64
    lib.wal_count_records.argtypes = [c.c_char_p]

    lib.hnsw_create.restype = c.c_void_p
    lib.hnsw_create.argtypes = [c.c_int, c.c_int, c.c_int, c.c_int, c.c_uint64]
    lib.hnsw_free.argtypes = [c.c_void_p]
    lib.hnsw_size.restype = c.c_int64
    lib.hnsw_size.argtypes = [c.c_void_p]
    lib.hnsw_add.argtypes = [c.c_void_p, f32p, c.c_int64]
    lib.hnsw_search.argtypes = [
        c.c_void_p, f32p, c.c_int64, c.c_int, c.c_int, i64p, f32p,
    ]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.hnsw_entry.restype = c.c_int
    lib.hnsw_entry.argtypes = [c.c_void_p]
    lib.hnsw_max_level.restype = c.c_int
    lib.hnsw_max_level.argtypes = [c.c_void_p]
    lib.hnsw_levels.argtypes = [c.c_void_p, i32p]
    lib.hnsw_links_layer.argtypes = [c.c_void_p, c.c_int, c.c_int, i32p]


class NativeArena:
    """Packed float32 row storage backed by the C++ arena."""

    def __init__(self, dims: int, capacity: int = 128, _handle=None):
        lib = load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {build_error()}")
        self._lib = lib
        self.dims = dims
        self._h = (
            _handle
            if _handle is not None
            else lib.arena_create(dims, capacity)
        )

    @property
    def capacity(self) -> int:
        return self._lib.arena_capacity(self._h)

    def set(self, rows: np.ndarray, vecs: np.ndarray) -> None:
        rows = np.ascontiguousarray(rows, np.int64)
        vecs = np.ascontiguousarray(vecs, np.float32)
        self._lib.arena_set(self._h, rows, vecs, len(rows))

    def invalidate(self, rows: np.ndarray) -> None:
        rows = np.ascontiguousarray(rows, np.int64)
        self._lib.arena_invalidate(self._h, rows, len(rows))

    def get(self, rows: np.ndarray) -> np.ndarray:
        rows = np.ascontiguousarray(rows, np.int64)
        out = np.empty((len(rows), self.dims), np.float32)
        self._lib.arena_get(self._h, rows, out, len(rows))
        return out

    def view(self) -> tuple[np.ndarray, np.ndarray]:
        """Zero-copy (data [cap, dims], valid [cap]) views."""
        cap = self.capacity
        data = np.ctypeslib.as_array(
            self._lib.arena_data(self._h), shape=(cap, self.dims)
        )
        valid = np.ctypeslib.as_array(
            self._lib.arena_valid(self._h), shape=(cap,)
        )
        return data, valid.view(bool)

    def save(self, path: str) -> None:
        rc = self._lib.arena_save(self._h, path.encode())
        if rc != 0:
            raise OSError(f"arena_save failed ({rc}): {path}")

    @classmethod
    def loadfile(cls, path: str) -> "NativeArena":
        lib = load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {build_error()}")
        h = lib.arena_load(path.encode())
        if not h:
            raise OSError(f"arena_load failed: {path}")
        # dims recovered from the file via capacity*dims layout: store dims
        # in a sidecar-free way by reading the header ourselves
        import struct

        with open(path, "rb") as f:
            f.read(8)
            dims = struct.unpack("<q", f.read(8))[0]
        return cls(dims, _handle=h)

    def __del__(self):
        try:
            self._lib.arena_free(self._h)
        except Exception:
            pass


class CpuHnsw:
    """Single-threaded CPU HNSW (the reference-engine-class baseline)."""

    def __init__(
        self,
        dims: int,
        m: int = 16,
        ef_construction: int = 200,
        metric: str = "l2",
        seed: int = 100,
    ):
        lib = load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {build_error()}")
        self._lib = lib
        self.dims = dims
        self.metric = metric
        self._h = lib.hnsw_create(
            dims, m, ef_construction, 1 if metric in ("ip", "cosine") else 0, seed
        )

    def add(self, vecs: np.ndarray) -> None:
        vecs = np.ascontiguousarray(vecs, np.float32)
        if self.metric == "cosine":
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30
            )
        self._lib.hnsw_add(self._h, vecs, len(vecs))

    def search(
        self, queries: np.ndarray, k: int, ef: int = 10
    ) -> tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, np.float32)
        if self.metric == "cosine":
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-30
            )
        nq = len(queries)
        ids = np.empty((nq, k), np.int64)
        dists = np.empty((nq, k), np.float32)
        self._lib.hnsw_search(self._h, queries, nq, k, ef, ids, dists)
        return dists, ids

    def __len__(self) -> int:
        return self._lib.hnsw_size(self._h)

    # ---- graph introspection (diagnostics / graph import) ----

    @property
    def entry(self) -> int:
        return self._lib.hnsw_entry(self._h)

    @property
    def max_level(self) -> int:
        return self._lib.hnsw_max_level(self._h)

    def levels(self) -> np.ndarray:
        out = np.empty(len(self), np.int32)
        self._lib.hnsw_levels(self._h, out)
        return out

    def links_layer(self, layer: int, width: int) -> np.ndarray:
        """Adjacency of one layer as [n, width] int32, -1 padded."""
        out = np.empty((len(self), width), np.int32)
        self._lib.hnsw_links_layer(self._h, layer, width, out)
        return out

    def __del__(self):
        try:
            self._lib.hnsw_free(self._h)
        except Exception:
            pass
