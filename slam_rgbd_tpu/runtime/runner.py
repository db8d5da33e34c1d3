"""Threaded pipeline runner: source -> bounded queue -> SLAM consumer.

The process-level architecture of the reference (SURVEY.md §1: sensor
thread -> logging hub -> consumers over bounded queues, an interactive
control channel, watchdog, ordered shutdown) mapped to a host pipeline
feeding device computation:

    producer thread:  frame source (dataset / synthetic / replay),
                      optional pacing, optional recording tee
    bounded queue:    capacity/drop-to policy from StreamConfig
    consumer thread:  SLAMSession.process_frame per frame
    watchdog thread:  heartbeat monitoring
    control channel:  START/STOP_RECORD, START/STOP_PLAYBACK, RESET,
                      SHUTDOWN (`frameDefinitions.h:39-42` verbs)

`run()` is also usable synchronously (threads=False) for benchmarks.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Iterable, Optional

import numpy as np

from slam_rgbd_tpu.core.config import SLAMConfig
from slam_rgbd_tpu.io import stream as st
from slam_rgbd_tpu.runtime.session import SLAMSession
from slam_rgbd_tpu.runtime.watchdog import GracefulShutdown, Watchdog

log = logging.getLogger("slam_rgbd_tpu.runner")


class MetricsLog:
    """Structured per-interval metrics (SURVEY.md §5 observability plan)."""

    def __init__(self):
        self.records: list[dict] = []

    def emit(self, session: SLAMSession, queue_depth: int):
        recent = session.stats[-30:]
        if not recent:
            return
        rec = {
            "t": time.time(),
            "frames": session.state.frames,
            "fps": 1e3 / max(np.mean([s.track_ms for s in recent]), 1e-6),
            "keyframes": session.state.keyframes,
            "map_points": session.map_point_count(),
            "loops": session.state.loops,
            "lost": session.state.lost,
            "queue_depth": queue_depth,
            "mean_inlier_fraction": float(np.mean([s.inlier_fraction for s in recent])),
        }
        self.records.append(rec)
        log.info("metrics: %s", rec)


class PipelineRunner:
    def __init__(self, config: SLAMConfig, source: Iterable[st.Frame]):
        self.cfg = config
        self.source = source
        self.session = SLAMSession(config)
        self.queue = st.BoundedFrameQueue(
            config.stream.queue_capacity, config.stream.queue_drop_to
        )
        self.control = st.ControlChannel()
        self.metrics = MetricsLog()
        self.recorder: Optional[st.StreamRecorder] = None
        self.playback_source: Optional[Iterable] = None
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()
        self.shutdown = GracefulShutdown(config.runtime.shutdown_timeout_s)
        self.watchdog = Watchdog(
            lambda: self.session.state.last_heartbeat,
            stall_timeout_s=max(10.0, 50 * 1.0 / config.camera.fps),
            period_s=config.runtime.watchdog_period_s,
        )

    # ---------------------------------------------------------------- control
    def _handle_control(self):
        cmd = self.control.poll()
        if cmd is None:
            return
        verb, arg = cmd
        if verb == st.ControlCommand.START_RECORD:
            if self.recorder is None and arg:
                self.recorder = st.open_recorder(arg)
                log.info("recording to %s", arg)
        elif verb == st.ControlCommand.STOP_RECORD:
            if self.recorder is not None:
                self.recorder.close()
                self.recorder = None
        elif verb == st.ControlCommand.START_PLAYBACK:
            if arg:
                # playback replaces the live source (passthrough-off
                # semantics, `loggingModule.c:244-248`)
                self.playback_source = st.paced(
                    iter(st.open_reader(arg, prefetch=self.cfg.stream.prefetch)),
                    self.cfg.stream.paced_fps,
                )
                log.info("playback from %s", arg)
        elif verb == st.ControlCommand.STOP_PLAYBACK:
            self.playback_source = None
        elif verb == st.ControlCommand.RESET:
            self.session.reset()
        elif verb == st.ControlCommand.SHUTDOWN:
            self._stop.set()

    # ---------------------------------------------------------------- threads
    def _producer(self):
        src = iter(self.source)
        while not self._stop.is_set():
            self._handle_control()
            active = self.playback_source if self.playback_source is not None else src
            try:
                frame = next(active)
            except StopIteration:
                if self.playback_source is not None:
                    self.playback_source = None
                    continue
                break
            ts, depth, rgb = frame
            if self.recorder is not None:
                self.recorder.write(ts, depth, rgb)
            self.queue.put(frame)
        self.queue.close()

    def _consumer(self):
        while True:
            item = self.queue.get()
            if item is None:
                return
            ts, depth, rgb = item
            self.session.process_frame(ts, depth, rgb)
            if self.session.state.frames % self.cfg.runtime.metrics_every_frames == 0:
                self.metrics.emit(self.session, len(self.queue))

    # ------------------------------------------------------------------- run
    def run(self, threads: bool = True) -> SLAMSession:
        if not threads:
            for ts, depth, rgb in self.source:
                if self.recorder is not None:
                    self.recorder.write(ts, depth, rgb)
                self.session.process_frame(ts, depth, rgb)
            return self.session

        self.watchdog.start()
        prod = threading.Thread(target=self._producer, name="slam-producer")
        cons = threading.Thread(target=self._consumer, name="slam-consumer")
        self._threads = [prod, cons]
        prod.start()
        cons.start()
        try:
            while cons.is_alive():
                cons.join(timeout=0.2)
        finally:
            self.stop()
        return self.session

    def stop(self):
        self._stop.set()
        self.queue.close()
        clean = self.shutdown.request(self._threads)
        self.watchdog.stop()
        if self.recorder is not None:
            self.recorder.close()
        self.session.state.running = False
        return clean
