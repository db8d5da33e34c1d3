"""Frame streams: record / replay, bounded queues, pacing, control verbs.

TPU-native re-design of the reference's logging + transport layer:

  * `.rgbd` recording format — same information content as the reference's
    `.bin` stream `[FrameHeader][depth][color]`* + EOF marker
    (`Youth.Source/frameDefinitions.h:11-20`,
    `Youth.Source/LoggingModule/loggingModule.c:101-130,223-226`), but with a
    magic/version header and whole-frame writes (no 8 KiB chunking: the
    chunk/reassembly protocol existed because of the mqueue message cap —
    `frameDefinitions.h:64` — which has no analogue here).
  * `BoundedFrameQueue` — ingest backpressure with the reference's drop
    policy: warn above `capacity`, drop oldest down to `drop_to`
    (`Youth.Source/AlgorithmModule/SLAM.cpp:162-168`).
  * `Paced` — ~30 fps pacing iterator (`sensorModule.c:242-243` semantics).
  * `ControlChannel` — thread-safe command verbs START/STOP_RECORD,
    START/STOP_PLAYBACK, RESET (`frameDefinitions.h:39-42`, `SLAM.h:35`).
  * `RetryingSource` — init-retry + consecutive-error reinit fault tolerance
    (`sensorModule.c:50-67` 3 init attempts; `sensorModule.c:25,216-239`
    5 consecutive errors => reinitialize).

A native C++ codec for the same format lives in `native/` (used when built;
this module transparently falls back to the pure-Python path).
"""

from __future__ import annotations

import enum
import logging
import os
import queue
import struct
import threading
import time
import zlib
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

log = logging.getLogger("slam_rgbd_tpu.stream")

MAGIC = b"RGBDTPU2"
MAGIC_V1 = b"RGBDTPU1"  # legacy: no payload checksum
# Per-frame header: frame_id, timestamp_us, frame_type, width, height,
# depth_bytes, color_bytes, crc32  (reference FrameHeader fields,
# `frameDefinitions.h:11-20`, with the reserved word used as a zlib CRC32
# over depth+color payload — a byte flipped on disk raises instead of
# silently feeding the tracker garbage).
_FRAME_HDR = struct.Struct("<QQIIIIII")
_FRAME_HDR_V1 = struct.Struct("<QQIIIII")
FRAME_TYPE_SENSOR = 1  # FRAME_TYPE_SENSOR_DATA analogue
FRAME_TYPE_EOF = 2  # FRAME_TYPE_END_OF_FILE analogue (`loggingModule.c:223-226`)

Frame = Tuple[float, np.ndarray, np.ndarray]  # (ts_s, depth u16 HxW, rgb u8 HxWx3)


class StreamRecorder:
    """Append frames to a `.rgbd` file; explicit EOF marker on close.

    Write path mirrors `saveFrameToFile` (`loggingModule.c:101-130`): one
    contiguous header+depth+color record per frame, flushed, so a crashed
    recording is still replayable up to the last complete frame.
    """

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._frame_id = 0
        self._lock = threading.Lock()
        self.closed = False

    def write(self, ts: float, depth: np.ndarray, rgb: np.ndarray) -> None:
        depth = np.ascontiguousarray(depth, dtype=np.uint16)
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        h, w = depth.shape
        crc = zlib.crc32(rgb.tobytes(), zlib.crc32(depth.tobytes()))
        hdr = _FRAME_HDR.pack(
            self._frame_id, int(ts * 1e6), FRAME_TYPE_SENSOR, w, h,
            depth.nbytes, rgb.nbytes, crc,
        )
        with self._lock:
            self._f.write(hdr)
            self._f.write(depth.tobytes())
            self._f.write(rgb.tobytes())
            self._f.flush()
            self._frame_id += 1

    def close(self) -> None:
        with self._lock:
            if self.closed:
                return
            self._f.write(
                _FRAME_HDR.pack(self._frame_id, 0, FRAME_TYPE_EOF, 0, 0, 0, 0, 0)
            )
            self._f.flush()
            self._f.close()
            self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class StreamReader:
    """Sequential reader for `.rgbd` recordings with validation.

    Validation semantics from `readFrameFromFile` (`loggingModule.c:417-427`):
    bounds-check sizes, stop cleanly at the EOF marker or on truncation.
    """

    def __init__(self, path: str, max_frame_bytes: int = 64 << 20):
        self._f = open(path, "rb")
        self.max_frame_bytes = max_frame_bytes
        magic = self._f.read(len(MAGIC))
        if magic == MAGIC:
            self._hdr = _FRAME_HDR
        elif magic == MAGIC_V1:  # legacy recordings: no payload CRC
            self._hdr = _FRAME_HDR_V1
        else:
            raise ValueError(f"{path}: bad magic {magic!r}")

    def __iter__(self) -> Iterator[Frame]:
        while True:
            hdr = self._f.read(self._hdr.size)
            if len(hdr) < self._hdr.size:
                log.warning("recording truncated (no EOF marker)")
                return
            fid, ts_us, ftype, w, h, dbytes, cbytes, *rest = self._hdr.unpack(hdr)
            if ftype == FRAME_TYPE_EOF:
                return
            if ftype != FRAME_TYPE_SENSOR or not (
                0 < dbytes <= self.max_frame_bytes and 0 < cbytes <= self.max_frame_bytes
                and dbytes == w * h * 2 and cbytes == w * h * 3
            ):
                raise ValueError(f"corrupt frame {fid}: type={ftype} {w}x{h} d={dbytes} c={cbytes}")
            draw = self._f.read(dbytes)
            craw = self._f.read(cbytes)
            if rest:  # v2: payload integrity
                crc = zlib.crc32(craw, zlib.crc32(draw))
                if crc != rest[0]:
                    raise ValueError(
                        f"corrupt frame {fid}: payload CRC mismatch "
                        f"(got {crc:#010x}, recorded {rest[0]:#010x})"
                    )
            depth = np.frombuffer(draw, dtype=np.uint16).reshape(h, w)
            rgb = np.frombuffer(craw, dtype=np.uint8).reshape(h, w, 3)
            yield ts_us / 1e6, depth, rgb

    def close(self) -> None:
        self._f.close()


class BoundedFrameQueue:
    """Thread-safe frame queue with the reference's backpressure policy.

    `put` never blocks the producer: when the queue holds more than
    `capacity` frames it warns and drops the *oldest* frames down to
    `drop_to` (`SLAM.cpp:162-168` — keeps the freshest data, bounded
    latency over lossless delivery, correct for a real-time tracker).
    """

    def __init__(self, capacity: int = 10, drop_to: int = 5):
        assert drop_to <= capacity
        self.capacity = capacity
        self.drop_to = drop_to
        self._q: "queue.deque" = None  # type: ignore
        import collections

        self._dq = collections.deque()
        self._cv = threading.Condition()
        self.dropped = 0
        self._closed = False

    def put(self, item) -> None:
        with self._cv:
            self._dq.append(item)
            if len(self._dq) > self.capacity:
                n = len(self._dq) - self.drop_to
                for _ in range(n):
                    self._dq.popleft()
                self.dropped += n
                log.warning("frame queue over capacity; dropped %d (total %d)", n, self.dropped)
            self._cv.notify()

    def get(self, timeout: Optional[float] = None):
        """Pop the oldest frame; None when closed and drained."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cv:
            while not self._dq:
                if self._closed:
                    return None
                remaining = None if deadline is None else deadline - time.monotonic()
                if remaining is not None and remaining <= 0:
                    raise TimeoutError("frame queue get timed out")
                self._cv.wait(remaining)
            return self._dq.popleft()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()

    def __len__(self) -> int:
        with self._cv:
            return len(self._dq)


def paced(frames: Iterator[Frame], fps: float) -> Iterator[Frame]:
    """Pace an iterator at `fps` (the usleep(33333) of `sensorModule.c:243`)."""
    if fps <= 0:
        yield from frames
        return
    period = 1.0 / fps
    next_t = time.monotonic()
    for f in frames:
        now = time.monotonic()
        if now < next_t:
            time.sleep(next_t - now)
        next_t = max(next_t + period, now)
        yield f


def open_recorder(path: str, prefer_native: bool = True):
    """Recorder factory: the native C++ codec when available, else Python.

    Both produce bit-identical files (tested); the native path does its
    buffered writes without holding the GIL.
    """
    if prefer_native:
        try:
            from slam_rgbd_tpu.io import native

            if native.native_available():
                return native.NativeStreamRecorder(path)
        except Exception:  # noqa: BLE001 — native is best-effort
            log.debug("native recorder unavailable; using Python codec")
    return StreamRecorder(path)


def open_reader(path: str, prefer_native: bool = True, prefetch: int = 0):
    """Reader factory: native prefetching reader when available.

    `prefetch` > 0 uses the C++ reader thread decoding ahead of the
    consumer (the data-loader path); 0 reads synchronously.
    """
    if prefer_native:
        try:
            from slam_rgbd_tpu.io import native

            if native.native_available():
                if prefetch > 0:
                    return native.NativePrefetcher(path, capacity=prefetch)
                return native.NativeStreamReader(path)
        except Exception:  # noqa: BLE001
            log.debug("native reader unavailable; using Python codec")
    return StreamReader(path)


class ControlCommand(enum.Enum):
    """The reference's control verbs (`frameDefinitions.h:39-42` + RESET
    from `SLAM.h:35`)."""

    START_RECORD = 1
    STOP_RECORD = 2
    START_PLAYBACK = 3
    STOP_PLAYBACK = 4
    RESET = 5
    SHUTDOWN = 6


class ControlChannel:
    """In-process control queue mirroring `/control_queue` semantics
    (`loggingModule.c:186-275`): non-blocking poll by the consumer,
    commands carry an optional filename argument."""

    def __init__(self):
        self._q: queue.Queue = queue.Queue()

    def send(self, cmd: ControlCommand, arg: Optional[str] = None) -> None:
        self._q.put((cmd, arg))

    def poll(self):
        """Non-blocking: (cmd, arg) or None."""
        try:
            return self._q.get_nowait()
        except queue.Empty:
            return None


class SourceError(RuntimeError):
    pass


class RetryingSource:
    """Wrap a frame-source factory with init retries and error-reinit.

    Fault-tolerance contract from the reference sensor loop:
      * init: up to `init_retries` attempts with backoff
        (`sensorModule.c:50-67`).
      * run: after `max_consecutive_errors` consecutive read failures, tear
        down and re-initialize the source (`sensorModule.c:25,216-239`).
    """

    def __init__(
        self,
        factory: Callable[[], Iterator[Frame]],
        init_retries: int = 3,
        max_consecutive_errors: int = 5,
        backoff_s: float = 0.05,
    ):
        self._factory = factory
        self.init_retries = init_retries
        self.max_consecutive_errors = max_consecutive_errors
        self.backoff_s = backoff_s
        self.reinit_count = 0
        self.error_count = 0

    def _init(self) -> Iterator[Frame]:
        last = None
        for attempt in range(self.init_retries):
            try:
                return self._factory()
            except Exception as e:  # noqa: BLE001 — deliberate retry boundary
                last = e
                log.warning("source init attempt %d/%d failed: %s", attempt + 1, self.init_retries, e)
                time.sleep(self.backoff_s * (attempt + 1))
        raise SourceError(f"source init failed after {self.init_retries} attempts") from last

    def __iter__(self) -> Iterator[Frame]:
        src = self._init()
        consecutive = 0
        while True:
            try:
                item = next(src)
                consecutive = 0
                yield item
            except StopIteration:
                return
            except Exception as e:  # noqa: BLE001
                consecutive += 1
                self.error_count += 1
                log.warning("source read error %d/%d: %s", consecutive, self.max_consecutive_errors, e)
                if consecutive >= self.max_consecutive_errors:
                    log.warning("too many consecutive errors — reinitializing source")
                    self.reinit_count += 1
                    src = self._init()
                    consecutive = 0
