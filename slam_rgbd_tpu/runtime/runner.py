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
from typing import Iterable, Optional

from slam_rgbd_tpu.core.config import SLAMConfig
from slam_rgbd_tpu.io import stream as st
from slam_rgbd_tpu.runtime.profiling import MetricsLog
from slam_rgbd_tpu.runtime.session import SLAMSession
from slam_rgbd_tpu.runtime.watchdog import GracefulShutdown, Watchdog

log = logging.getLogger("slam_rgbd_tpu.runner")


class PipelineRunner:
    def __init__(self, config: SLAMConfig, source: Iterable[st.Frame],
                 async_backend: bool = True):
        self.cfg = config
        self.source = source
        # One metrics sink, one schema: the session logs "frame_window"
        # records into it and the runner adds "queue" records.
        self.metrics = MetricsLog()
        # The pipeline decouples BA/loop closure from tracking by default
        # (the reference's dedicated processing thread, `SLAM.cpp:32-63`).
        self.session = SLAMSession(
            config, metrics=self.metrics, async_backend=async_backend
        )
        self.queue = st.BoundedFrameQueue(
            config.stream.queue_capacity, config.stream.queue_drop_to
        )
        self.control = st.ControlChannel()
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
                self.metrics.log(
                    "queue", depth=len(self.queue), dropped=self.queue.dropped
                )

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
        self.session.close()  # drain + stop the backend worker
        self.session.state.running = False
        return clean


class ControlMenu:
    """Interactive runtime control — the reference's stdin menu
    (`displayMenu`/`processUserInput`, `Youth.Source/main.c:57-159`) issuing
    the same verbs through the `ControlChannel`:

        1 <file>   start recording        2   stop recording
        3 <file>   start playback         4   stop playback
        r          reset SLAM system      s   status line
        q          quit (graceful shutdown)

    `infile`/`outfile` are injectable so tests can script the stdin session
    (`main.c` reads the real stdin via its 100 ms select loop).
    """

    def __init__(self, runner: PipelineRunner, infile=None, outfile=None):
        import sys

        self.runner = runner
        self._in = infile if infile is not None else sys.stdin
        self._out = outfile if outfile is not None else sys.stdout
        self._thread: Optional[threading.Thread] = None

    def _print(self, msg: str):
        try:
            self._out.write(msg + "\n")
            self._out.flush()
        except ValueError:  # closed stream during shutdown
            pass

    def banner(self):
        self._print(
            "menu: 1 <file>=record  2=stop-record  3 <file>=playback  "
            "4=stop-playback  r=reset  s=status  q=quit"
        )

    def _dispatch(self, line: str) -> bool:
        """Handle one command line; returns False on quit."""
        ctl, sess = self.runner.control, self.runner.session
        parts = line.strip().split(maxsplit=1)
        if not parts:
            return True
        verb, arg = parts[0], (parts[1] if len(parts) > 1 else None)
        if verb == "1":
            if not arg:
                self._print("usage: 1 <output.rgbd>")
            else:
                ctl.send(st.ControlCommand.START_RECORD, arg)
                self._print(f"recording -> {arg}")
        elif verb == "2":
            ctl.send(st.ControlCommand.STOP_RECORD)
            self._print("recording stopped")
        elif verb == "3":
            if not arg:
                self._print("usage: 3 <input.rgbd>")
            else:
                ctl.send(st.ControlCommand.START_PLAYBACK, arg)
                self._print(f"playback <- {arg}")
        elif verb == "4":
            ctl.send(st.ControlCommand.STOP_PLAYBACK)
            self._print("playback stopped")
        elif verb == "r":
            ctl.send(st.ControlCommand.RESET)
            self._print("reset requested")
        elif verb == "s":
            s = sess.state
            self._print(
                f"status: frames={s.frames} keyframes={s.keyframes} "
                f"map_points={sess.map_point_count()} loops={s.loops} "
                f"lost={s.lost} queue={len(self.runner.queue)}"
            )
        elif verb == "q":
            ctl.send(st.ControlCommand.SHUTDOWN)
            self._print("shutting down")
            return False
        else:
            self.banner()
        return True

    def _loop(self):
        self.banner()
        for line in self._in:
            if not self._dispatch(line):
                return
            if self.runner._stop.is_set():
                return

    def start(self) -> threading.Thread:
        self._thread = threading.Thread(
            target=self._loop, name="slam-menu", daemon=True
        )
        self._thread.start()
        return self._thread
