"""ctypes bindings for the native data plane (dataplane.cpp).

Builds the shared library on first use with g++ -O3 (cached next to the
source); every entry point has a numpy fallback so the package works even
without a toolchain. See dataplane.cpp for the C ABI.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
import warnings
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataplane.cpp")
_LIB_PATH = os.path.join(_HERE, "libdataplane.so")
_STAMP_PATH = _LIB_PATH + ".srchash"

_lib = None
_lib_lock = threading.Lock()


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> Optional[str]:
    # -march=native is safe here because the binary is always (re)built on
    # the host that runs it: the .so is never committed, and a cached copy
    # is only reused when the source-hash stamp written at build time
    # matches (a stale or foreign binary is rebuilt, not trusted).
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        with open(_STAMP_PATH, "w") as f:
            f.write(_src_hash())
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as e:
        warnings.warn(f"native data plane build failed ({e}); "
                      "using numpy fallbacks")
        return None


def _cached_lib_fresh() -> bool:
    if not os.path.isfile(_LIB_PATH) or not os.path.isfile(_STAMP_PATH):
        return False
    try:
        with open(_STAMP_PATH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = _LIB_PATH if _cached_lib_fresh() else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            # Cached binary unloadable (e.g. built for another host):
            # rebuild once from source.
            path = _build()
            if path is None:
                return None
            lib = ctypes.CDLL(path)
        lib.decode_cifar10_binary.restype = ctypes.c_int64
        lib.decode_cifar10_binary.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
        lib.decode_stl10.restype = ctypes.c_int64
        lib.decode_stl10.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
        lib.pipeline_create.restype = ctypes.c_void_p
        lib.pipeline_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64]
        lib.pipeline_next.restype = ctypes.c_int
        lib.pipeline_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
        lib.pipeline_steps_per_epoch.restype = ctypes.c_int64
        lib.pipeline_steps_per_epoch.argtypes = [ctypes.c_void_p]
        lib.pipeline_destroy.restype = None
        lib.pipeline_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def decode_cifar10_binary(
    bin_dir: str, train: bool
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native CIFAR-10 binary decode; None if the library is unavailable
    (callers fall back to the numpy decoder in datasets.py)."""
    lib = load_library()
    if lib is None:
        return None
    n_max = 50_000 if train else 10_000
    images = np.empty((n_max, 32, 32, 3), np.uint8)
    labels = np.empty((n_max,), np.int32)
    n = lib.decode_cifar10_binary(
        bin_dir.encode(), int(train), _u8ptr(images), _i32ptr(labels))
    if n <= 0:
        return None
    return images[:n], labels[:n]


def decode_stl10(
    x_path: str, y_path: Optional[str], n_samples: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = load_library()
    if lib is None:
        return None
    images = np.empty((n_samples, 96, 96, 3), np.uint8)
    labels = np.full((n_samples,), -1, np.int32)
    n = lib.decode_stl10(
        x_path.encode(), (y_path or "").encode(),
        _u8ptr(images), _i32ptr(labels))
    if n <= 0:
        return None
    return images[:n], labels[:n]


class NativePipeline:
    """Double-buffered shuffled batch assembler backed by a C++ worker
    thread. Batches are gathered into reusable host buffers while the device
    consumes the previous one."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, seed: int = 0):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native data plane unavailable")
        self._lib = lib
        self._images = np.ascontiguousarray(images)  # keep alive (borrowed)
        self._labels = np.ascontiguousarray(labels, dtype=np.int32)
        self.batch_size = batch_size
        self.sample_shape = images.shape[1:]
        sample_bytes = int(np.prod(self.sample_shape))
        self._handle = lib.pipeline_create(
            _u8ptr(self._images), _i32ptr(self._labels),
            images.shape[0], sample_bytes, batch_size, seed)
        if not self._handle:
            raise ValueError("pipeline_create failed (batch > n?)")
        self.steps_per_epoch = lib.pipeline_steps_per_epoch(self._handle)
        # Two alternating output buffers: the C++ worker assembles batch
        # t+1 while the caller consumes batch t.
        self._out = [
            (np.empty((batch_size,) + self.sample_shape, np.uint8),
             np.empty((batch_size,), np.int32))
            for _ in range(2)
        ]
        self._slot = 0

    def next(self, copy: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """Blocking; returns the next shuffled batch.

        By default returns an OWNED copy (a ~1.5 MB memcpy at CIFAR batch
        512 — negligible next to the device transfer), so the arrays stay
        valid no matter how far an async consumer (e.g. JAX dispatch with
        in-flight `jax.device_put`s) runs ahead. `copy=False` returns views
        over the internal double buffer that are only valid until the
        SECOND following `next()` call AND must not be read by still-
        pending transfers at that point — callers taking this path must
        synchronize (e.g. block on the device array from two calls ago)
        before each call.
        """
        imgs, labs = self._out[self._slot]
        self._slot ^= 1
        self._lib.pipeline_next(self._handle, _u8ptr(imgs), _i32ptr(labs))
        if copy:
            return imgs.copy(), labs.copy()
        return imgs, labs

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.pipeline_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
