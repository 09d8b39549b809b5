"""ctypes bindings for the native data-plane library (native/lmsf_io.cpp).

Builds ``liblmsf_io.so`` on first use with g++ (cached by source mtime) —
no pybind11 in this image, so the C ABI + ctypes is the binding layer.
Every entry point has a pure-numpy fallback so the package works without a
compiler; ``native_available()`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "lmsf_io.cpp")
_SO = os.path.join(_REPO, "native", "liblmsf_io.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SRC):
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.lmsf_read_f32.restype = ctypes.c_int64
    lib.lmsf_read_f32.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
    lib.lmsf_file_size.restype = ctypes.c_int64
    lib.lmsf_file_size.argtypes = [ctypes.c_char_p]
    lib.lmsf_write_pcd.restype = ctypes.c_int
    lib.lmsf_write_pcd.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
    lib.lmsf_read_pcd.restype = ctypes.c_int64
    lib.lmsf_read_pcd.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
    lib.lmsf_ring_create.restype = ctypes.c_void_p
    lib.lmsf_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.lmsf_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.lmsf_ring_push.restype = ctypes.c_int
    lib.lmsf_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.lmsf_ring_pop.restype = ctypes.c_int64
    lib.lmsf_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.lmsf_ring_size.restype = ctypes.c_int64
    lib.lmsf_ring_size.argtypes = [ctypes.c_void_p]
    lib.lmsf_prefetch_create.restype = ctypes.c_void_p
    lib.lmsf_prefetch_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.lmsf_prefetch_next.restype = ctypes.c_int64
    lib.lmsf_prefetch_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64]
    lib.lmsf_prefetch_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def read_f32(path: str, max_floats: Optional[int] = None) -> np.ndarray:
    """Raw float32 file (KITTI .bin payload)."""
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=np.float32)
    if max_floats is None:
        max_floats = lib.lmsf_file_size(path.encode()) // 4
    out = np.empty(max_floats, np.float32)
    n = lib.lmsf_read_f32(path.encode(), out.ctypes.data, max_floats)
    if n < 0:
        raise IOError(path)
    return out[:n]


def write_pcd(path: str, xyz: np.ndarray):
    """Binary PCD v0.7 (x y z) — the reference's keyframe-cloud format."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    lib = _load()
    if lib is not None:
        if lib.lmsf_write_pcd(path.encode(), xyz.ctypes.data, xyz.shape[0]) != 0:
            raise IOError(path)
        return
    with open(path, "wb") as f:
        n = xyz.shape[0]
        f.write(
            (
                "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
                "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
                f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {n}\nDATA binary\n"
            ).encode()
        )
        f.write(xyz.tobytes())


def read_pcd(path: str, max_points: int = 1 << 22) -> np.ndarray:
    lib = _load()
    if lib is not None:
        out = np.empty((max_points, 3), np.float32)
        n = lib.lmsf_read_pcd(path.encode(), out.ctypes.data, max_points)
        if n < 0:
            raise IOError(path)
        return out[:n].copy()
    with open(path, "rb") as f:
        points = None
        while True:
            line = f.readline()
            if line.startswith(b"POINTS"):
                points = int(line.split()[1])
            if line.startswith(b"DATA"):
                assert b"binary" in line
                break
        data = np.frombuffer(f.read(points * 12), np.float32)
        return data.reshape(-1, 3).copy()


class NativeRing:
    """SPSC ring buffer of float32 payloads (DataManager bus equivalent)."""

    def __init__(self, slot_floats: int, n_slots: int):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self.slot_floats = slot_floats
        self._h = self._lib.lmsf_ring_create(slot_floats * 4, n_slots)

    def push(self, arr: np.ndarray) -> bool:
        arr = np.ascontiguousarray(arr, np.float32)
        rc = self._lib.lmsf_ring_push(self._h, arr.ctypes.data, arr.nbytes)
        if rc == -2:
            raise ValueError("payload exceeds slot size")
        return rc == 0

    def pop(self) -> Optional[np.ndarray]:
        out = np.empty(self.slot_floats, np.float32)
        n = self._lib.lmsf_ring_pop(self._h, out.ctypes.data)
        if n < 0:
            return None
        return out[: n // 4].copy()

    def __len__(self):
        return int(self._lib.lmsf_ring_size(self._h))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.lmsf_ring_destroy(self._h)
            self._h = None


class ScanPrefetcher:
    """Background-thread file prefetcher: iterate (n_floats,) float32 arrays
    in file order while disk reads overlap compute."""

    def __init__(self, paths: list[str], slot_floats: int = 1 << 19,
                 n_slots: int = 4):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self.slot_floats = slot_floats
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._h = self._lib.lmsf_prefetch_create(
            arr, len(paths), slot_floats * 4, n_slots
        )

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty(self.slot_floats, np.float32)
        n = self._lib.lmsf_prefetch_next(self._h, out.ctypes.data,
                                         self.slot_floats)
        if n < 0:
            raise StopIteration
        return out[:n].copy()

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.lmsf_prefetch_destroy(self._h)
            self._h = None
