"""Native IO runtime tests: build, format cross-compat with Python codec,
queue semantics, prefetcher."""

import threading
import time

import numpy as np
import pytest

from slam_rgbd_tpu.io import native as nat
from slam_rgbd_tpu.io import stream as st

pytestmark = pytest.mark.skipif(
    not nat.native_available(), reason="libslamio not buildable"
)


def frames(rng, n=5, h=60, w=80):
    return [
        (
            i / 30.0,
            rng.integers(0, 5000, size=(h, w)).astype(np.uint16),
            rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8),
        )
        for i in range(n)
    ]


class TestCodecCrossCompat:
    def test_native_write_python_read(self, tmp_path, rng):
        path = str(tmp_path / "n2p.rgbd")
        fs = frames(rng)
        with nat.NativeStreamRecorder(path) as rec:
            for ts, d, c in fs:
                rec.write(ts, d, c)
        out = list(st.StreamReader(path))
        assert len(out) == 5
        for (t0, d0, c0), (t1, d1, c1) in zip(fs, out):
            assert abs(t0 - t1) < 1e-6
            assert np.array_equal(d0, d1) and np.array_equal(c0, c1)

    def test_python_write_native_read(self, tmp_path, rng):
        path = str(tmp_path / "p2n.rgbd")
        fs = frames(rng)
        with st.StreamRecorder(path) as rec:
            for ts, d, c in fs:
                rec.write(ts, d, c)
        r = nat.NativeStreamReader(path)
        out = list(r)
        r.close()
        assert len(out) == 5
        for (t0, d0, c0), (t1, d1, c1) in zip(fs, out):
            assert np.array_equal(d0, d1) and np.array_equal(c0, c1)

    def test_files_bit_identical(self, tmp_path, rng):
        fs = frames(rng, n=3)
        p_py = str(tmp_path / "py.rgbd")
        p_nat = str(tmp_path / "nat.rgbd")
        with st.StreamRecorder(p_py) as r1:
            for ts, d, c in fs:
                r1.write(ts, d, c)
        with nat.NativeStreamRecorder(p_nat) as r2:
            for ts, d, c in fs:
                r2.write(ts, d, c)
        assert open(p_py, "rb").read() == open(p_nat, "rb").read()

    def test_native_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.rgbd"
        p.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
        with pytest.raises(ValueError):
            nat.NativeStreamReader(str(p))


class TestNativeQueue:
    def test_fifo_and_drop_policy(self, rng):
        q = nat.NativeFrameQueue(capacity=10, drop_to=5, max_w=80, max_h=60)
        d = rng.integers(0, 5000, size=(60, 80)).astype(np.uint16)
        c = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
        for i in range(11):
            q.put(i / 30.0, d, c, frame_id=i)
        assert len(q) == 5
        assert q.dropped == 6
        ts, dd, cc = q.get(timeout_ms=100)
        assert np.array_equal(dd, d)
        q.destroy()

    def test_blocking_get_close(self, rng):
        q = nat.NativeFrameQueue(capacity=4, drop_to=2, max_w=80, max_h=60)
        got = []

        def consumer():
            while True:
                item = q.get()
                if item is None:
                    return
                got.append(item[0])

        t = threading.Thread(target=consumer)
        t.start()
        d = rng.integers(0, 5000, size=(60, 80)).astype(np.uint16)
        c = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
        for i in range(3):
            q.put(i * 1.0, d, c)
            time.sleep(0.01)
        time.sleep(0.05)
        q.close()
        t.join(timeout=2)
        assert not t.is_alive()
        assert got == [0.0, 1.0, 2.0]
        q.destroy()

    def test_timeout(self):
        q = nat.NativeFrameQueue(capacity=2, drop_to=1, max_w=80, max_h=60)
        with pytest.raises(TimeoutError):
            q.get(timeout_ms=50)
        q.destroy()


class TestPrefetcher:
    def test_prefetch_reads_all(self, tmp_path, rng):
        path = str(tmp_path / "pre.rgbd")
        fs = frames(rng, n=20)
        with st.StreamRecorder(path) as rec:
            for ts, d, c in fs:
                rec.write(ts, d, c)
        pf = nat.NativePrefetcher(path, capacity=4, max_w=80, max_h=60)
        out = list(pf)
        pf.close()
        assert len(out) == 20
        assert np.array_equal(out[7][1], fs[7][1])

    def test_prefetch_overlaps_consumer(self, tmp_path, rng):
        """Slow consumer: prefetcher keeps its ring full ahead of reads."""
        path = str(tmp_path / "pre2.rgbd")
        with st.StreamRecorder(path) as rec:
            for ts, d, c in frames(rng, n=10):
                rec.write(ts, d, c)
        pf = nat.NativePrefetcher(path, capacity=4, max_w=80, max_h=60)
        it = iter(pf)
        next(it)
        time.sleep(0.1)  # let the reader thread fill the ring
        n = 1 + sum(1 for _ in it)
        pf.close()
        assert n == 10

    def test_early_close(self, tmp_path, rng):
        path = str(tmp_path / "pre3.rgbd")
        with st.StreamRecorder(path) as rec:
            for ts, d, c in frames(rng, n=50):
                rec.write(ts, d, c)
        pf = nat.NativePrefetcher(path, capacity=2, max_w=80, max_h=60)
        it = iter(pf)
        next(it)
        pf.close()  # must not hang or crash with the reader mid-file
