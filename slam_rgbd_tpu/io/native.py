"""ctypes bindings for the native IO runtime (native/libslamio.so).

The compute path is JAX/XLA; the host IO path around it is native C++
where the reference's is C (codec, bounded transport, producer thread —
SURVEY.md §2 C2/C4/C5/C8). These bindings expose:

  * `NativeStreamRecorder` / `NativeStreamReader` — drop-in replacements
    for the Python codec in `io.stream` (same on-disk format, verified
    bit-identical in tests);
  * `NativeFrameQueue` — the bounded drop-oldest ring in C++ (no GIL on
    the producer side);
  * `NativePrefetcher` — a C++ reader thread decoding a recording ahead of
    the consumer (the data-loader: device steps never wait on disk).

The library auto-builds from source on first use when a compiler is
available; everything degrades gracefully to the Python implementations
(`native_available()` gates call sites).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

log = logging.getLogger("slam_rgbd_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libslamio.so")
_lib = None
_lib_lock = threading.Lock()
_HDR_BYTES = 24  # u64 frame_id, u64 ts_us, u32 w, u32 h


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # noqa: BLE001
        log.warning("native build failed: %s", e)
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log.warning("native load failed: %s", e)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.slamio_writer_open.restype = ctypes.c_void_p
        lib.slamio_writer_open.argtypes = [ctypes.c_char_p]
        lib.slamio_writer_write.restype = ctypes.c_int64
        lib.slamio_writer_write.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32,
            u8p, u8p,
        ]
        lib.slamio_writer_close.argtypes = [ctypes.c_void_p]
        lib.slamio_reader_open.restype = ctypes.c_void_p
        lib.slamio_reader_open.argtypes = [ctypes.c_char_p]
        lib.slamio_reader_next.restype = ctypes.c_int
        lib.slamio_reader_next.argtypes = [
            ctypes.c_void_p, u8p, u8p, ctypes.c_uint64, u8p, ctypes.c_uint64,
        ]
        lib.slamio_reader_close.argtypes = [ctypes.c_void_p]
        lib.slamio_queue_create.restype = ctypes.c_void_p
        lib.slamio_queue_create.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
        lib.slamio_queue_push.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.c_uint32, u8p, u8p,
        ]
        lib.slamio_queue_pop.restype = ctypes.c_int
        lib.slamio_queue_pop.argtypes = [
            ctypes.c_void_p, u8p, u8p, ctypes.c_uint64, u8p, ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.slamio_queue_dropped.restype = ctypes.c_uint64
        lib.slamio_queue_dropped.argtypes = [ctypes.c_void_p]
        lib.slamio_queue_depth.restype = ctypes.c_uint64
        lib.slamio_queue_depth.argtypes = [ctypes.c_void_p]
        lib.slamio_queue_close.argtypes = [ctypes.c_void_p]
        lib.slamio_queue_destroy.argtypes = [ctypes.c_void_p]
        lib.slamio_prefetch_open.restype = ctypes.c_void_p
        lib.slamio_prefetch_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.slamio_prefetch_next.restype = ctypes.c_int
        lib.slamio_prefetch_next.argtypes = lib.slamio_queue_pop.argtypes
        lib.slamio_prefetch_close.argtypes = [ctypes.c_void_p]
        lib.slamio_version.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeStreamRecorder:
    """C++ .rgbd writer (same format as `io.stream.StreamRecorder`)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("libslamio unavailable")
        self._lib = lib
        self._h = lib.slamio_writer_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")
        self.closed = False

    def write(self, ts: float, depth: np.ndarray, rgb: np.ndarray) -> int:
        depth = np.ascontiguousarray(depth, dtype=np.uint16)
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        h, w = depth.shape
        fid = self._lib.slamio_writer_write(
            self._h, int(ts * 1e6), w, h, _u8(depth.view(np.uint8)), _u8(rgb)
        )
        if fid < 0:
            raise OSError("native write failed")
        return fid

    def close(self):
        if not self.closed:
            self._lib.slamio_writer_close(self._h)
            self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeStreamReader:
    """C++ .rgbd reader; iterates (ts_s, depth u16, rgb u8)."""

    def __init__(self, path: str, max_w: int = 1920, max_h: int = 1080):
        lib = _load()
        if lib is None:
            raise RuntimeError("libslamio unavailable")
        self._lib = lib
        self._h = lib.slamio_reader_open(path.encode())
        if not self._h:
            raise ValueError(f"cannot open {path} (missing or bad magic)")
        self._dbuf = np.empty(max_w * max_h * 2, np.uint8)
        self._cbuf = np.empty(max_w * max_h * 3, np.uint8)
        self._hdr = np.empty(_HDR_BYTES, np.uint8)
        self._open = True

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
        while True:
            rc = self._lib.slamio_reader_next(
                self._h, _u8(self._hdr), _u8(self._dbuf), self._dbuf.nbytes,
                _u8(self._cbuf), self._cbuf.nbytes,
            )
            if rc == 0:
                return
            if rc < 0:
                raise ValueError("corrupt .rgbd frame (native reader)")
            fid, ts_us = np.frombuffer(self._hdr[:16], np.uint64)
            w, h = np.frombuffer(self._hdr[16:24], np.uint32)
            w, h = int(w), int(h)
            depth = self._dbuf[: w * h * 2].view(np.uint16).reshape(h, w).copy()
            rgb = self._cbuf[: w * h * 3].reshape(h, w, 3).copy()
            yield float(ts_us) / 1e6, depth, rgb

    def close(self):
        if self._open:
            self._lib.slamio_reader_close(self._h)
            self._open = False


class NativeFrameQueue:
    """C++ bounded drop-oldest frame ring (GIL-free producer side)."""

    def __init__(self, capacity: int = 10, drop_to: int = 5,
                 max_w: int = 1920, max_h: int = 1080):
        lib = _load()
        if lib is None:
            raise RuntimeError("libslamio unavailable")
        self._lib = lib
        self._h = lib.slamio_queue_create(capacity, drop_to)
        self._dbuf = np.empty(max_w * max_h * 2, np.uint8)
        self._cbuf = np.empty(max_w * max_h * 3, np.uint8)
        self._hdr = np.empty(_HDR_BYTES, np.uint8)

    def put(self, ts: float, depth: np.ndarray, rgb: np.ndarray,
            frame_id: int = 0):
        depth = np.ascontiguousarray(depth, dtype=np.uint16)
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        h, w = depth.shape
        self._lib.slamio_queue_push(
            self._h, frame_id, int(ts * 1e6), w, h,
            _u8(depth.view(np.uint8)), _u8(rgb),
        )

    def get(self, timeout_ms: int = -1):
        """(ts, depth, rgb) | None when closed | raises TimeoutError."""
        rc = self._lib.slamio_queue_pop(
            self._h, _u8(self._hdr), _u8(self._dbuf), self._dbuf.nbytes,
            _u8(self._cbuf), self._cbuf.nbytes, timeout_ms,
        )
        if rc == 0:
            return None
        if rc == -2:
            raise TimeoutError("native queue pop timed out")
        if rc < 0:
            raise ValueError("native queue pop failed")
        fid, ts_us = np.frombuffer(self._hdr[:16], np.uint64)
        w, h = (int(x) for x in np.frombuffer(self._hdr[16:24], np.uint32))
        depth = self._dbuf[: w * h * 2].view(np.uint16).reshape(h, w).copy()
        rgb = self._cbuf[: w * h * 3].reshape(h, w, 3).copy()
        return float(ts_us) / 1e6, depth, rgb

    @property
    def dropped(self) -> int:
        return int(self._lib.slamio_queue_dropped(self._h))

    def __len__(self) -> int:
        return int(self._lib.slamio_queue_depth(self._h))

    def close(self):
        self._lib.slamio_queue_close(self._h)

    def destroy(self):
        self._lib.slamio_queue_destroy(self._h)


class NativePrefetcher:
    """C++ reader thread decoding a .rgbd recording ahead of the consumer."""

    def __init__(self, path: str, capacity: int = 8,
                 max_w: int = 1920, max_h: int = 1080):
        lib = _load()
        if lib is None:
            raise RuntimeError("libslamio unavailable")
        self._lib = lib
        self._h = lib.slamio_prefetch_open(path.encode(), capacity, 0)
        if not self._h:
            raise ValueError(f"cannot open {path}")
        self._dbuf = np.empty(max_w * max_h * 2, np.uint8)
        self._cbuf = np.empty(max_w * max_h * 3, np.uint8)
        self._hdr = np.empty(_HDR_BYTES, np.uint8)
        self._open = True

    def __iter__(self):
        while True:
            rc = self._lib.slamio_prefetch_next(
                self._h, _u8(self._hdr), _u8(self._dbuf), self._dbuf.nbytes,
                _u8(self._cbuf), self._cbuf.nbytes, -1,
            )
            if rc == 0:
                return
            if rc < 0:
                raise ValueError("corrupt .rgbd frame (native prefetcher)")
            fid, ts_us = np.frombuffer(self._hdr[:16], np.uint64)
            w, h = (int(x) for x in np.frombuffer(self._hdr[16:24], np.uint32))
            depth = self._dbuf[: w * h * 2].view(np.uint16).reshape(h, w).copy()
            rgb = self._cbuf[: w * h * 3].reshape(h, w, 3).copy()
            yield float(ts_us) / 1e6, depth, rgb

    def close(self):
        if self._open:
            self._lib.slamio_prefetch_close(self._h)
            self._open = False
