"""ctypes bindings for the native wait-free control plane.

Builds ``native/control_plane.cpp`` on first use (cached next to the source)
and exposes the reference's L1 primitives — the bounded SPSC ring
(spsc.rs) and the last-value-wins triple buffer (swap.rs) — for the
real-time host integration.  See native/control_plane.cpp for the memory
model and progress guarantees.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "control_plane.cpp")
_LIB = os.path.join(_REPO, "native", "libcontrol_plane.so")

_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
    )


def load():
    """Build (if needed) and load the native library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.oddio_ring_new.restype = ctypes.c_void_p
        lib.oddio_ring_new.argtypes = [ctypes.c_size_t]
        lib.oddio_ring_free.argtypes = [ctypes.c_void_p]
        lib.oddio_ring_write.restype = ctypes.c_size_t
        lib.oddio_ring_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ]
        lib.oddio_ring_read.restype = ctypes.c_size_t
        lib.oddio_ring_read.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ]
        lib.oddio_ring_readable.restype = ctypes.c_size_t
        lib.oddio_ring_readable.argtypes = [ctypes.c_void_p]
        lib.oddio_ring_writable.restype = ctypes.c_size_t
        lib.oddio_ring_writable.argtypes = [ctypes.c_void_p]
        lib.oddio_swap_new.restype = ctypes.c_void_p
        lib.oddio_swap_new.argtypes = [ctypes.c_size_t]
        lib.oddio_swap_free.argtypes = [ctypes.c_void_p]
        lib.oddio_swap_publish.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.oddio_swap_refresh.restype = ctypes.c_int
        lib.oddio_swap_refresh.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
        return lib


class SpscRing:
    """Bounded wait-free SPSC float ring (spsc.rs semantics: partial writes
    return the count consumed)."""

    def __init__(self, capacity):
        self._lib = load()
        self._ptr = self._lib.oddio_ring_new(capacity)
        if not self._ptr:
            raise MemoryError("ring allocation failed")
        self.capacity = capacity

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.oddio_ring_free(self._ptr)
            self._ptr = None

    def write(self, samples):
        samples = np.ascontiguousarray(samples, dtype=np.float32)
        return self._lib.oddio_ring_write(
            self._ptr,
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            samples.size,
        )

    def read(self, n):
        out = np.empty(n, np.float32)
        got = self._lib.oddio_ring_read(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out[:got]

    def read_into(self, out):
        return self._lib.oddio_ring_read(
            self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
        )

    def readable(self):
        return self._lib.oddio_ring_readable(self._ptr)

    def writable(self):
        return self._lib.oddio_ring_writable(self._ptr)


class Swap:
    """Last-value-wins cross-thread cell for a fixed-dtype numpy payload
    (swap.rs semantics)."""

    def __init__(self, init):
        self._lib = load()
        init = np.ascontiguousarray(init)
        self._shape = init.shape
        self._dtype = init.dtype
        self._ptr = self._lib.oddio_swap_new(init.nbytes)
        if not self._ptr:
            raise MemoryError("swap allocation failed")
        self.publish(init)
        # receiver-side refresh so received() starts at init
        self.refresh()

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.oddio_swap_free(self._ptr)
            self._ptr = None

    def publish(self, value):
        value = np.ascontiguousarray(value, dtype=self._dtype)
        assert value.shape == self._shape
        self._lib.oddio_swap_publish(
            self._ptr, value.ctypes.data_as(ctypes.c_void_p)
        )

    def refresh(self):
        """Returns (fresh: bool, value)."""
        out = np.empty(self._shape, self._dtype)
        fresh = self._lib.oddio_swap_refresh(
            self._ptr, out.ctypes.data_as(ctypes.c_void_p)
        )
        return bool(fresh), out
