"""Tracing, stage timing, and structured metrics.

The reference has no profiling system — only wall-clock stamps carried on
every frame (`getCurrentTimeMs()` `sensorModule.c:31-35`, persisted through
`MessageHeader.timestamp`, SURVEY.md section 5). This module is the
framework's observability layer:

  * `StageTimer` — named host-side sections with running mean / EMA /
    percentile summaries (the per-stage analogue of the reference's carried
    timestamps).
  * `MetricsLog` — JSON-lines structured metrics (fps per chip, inlier
    fractions, BA ms/iteration, queue depths, ATE when ground truth is
    known): the `BASELINE.md` metric set.
  * `device_trace` — context manager around `jax.profiler.trace` for XLA /
    Pallas device timelines viewable in TensorBoard/Perfetto.
  * `speed_of_light` — roofline estimate for a kernel given bytes moved
    and measured seconds (HBM-bound kernels; v5e ~819 GB/s per chip).
"""

from __future__ import annotations

import contextlib
import json
import math
import time
from dataclasses import dataclass, field


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    ema_s: float = 0.0
    min_s: float = math.inf
    max_s: float = 0.0

    def add(self, dt: float, ema_alpha: float = 0.1):
        self.count += 1
        self.total_s += dt
        self.ema_s = dt if self.count == 1 else (
            ema_alpha * dt + (1 - ema_alpha) * self.ema_s
        )
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class StageTimer:
    """Named section timing: `with timer.section("track"): ...`."""

    def __init__(self):
        self.stages: dict[str, StageStats] = {}

    def add(self, name: str, seconds: float):
        """Record an externally-measured duration under `name`."""
        self.stages.setdefault(name, StageStats()).add(seconds)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.setdefault(name, StageStats()).add(
                time.perf_counter() - t0
            )

    def report(self) -> dict:
        """{stage: {count, mean_ms, ema_ms, min_ms, max_ms}}."""
        return {
            k: {
                "count": s.count,
                "mean_ms": round(s.mean_s * 1e3, 3),
                "ema_ms": round(s.ema_s * 1e3, 3),
                "min_ms": round(s.min_s * 1e3, 3),
                "max_ms": round(s.max_s * 1e3, 3),
            }
            for k, s in self.stages.items()
        }

    def summary(self) -> str:
        rows = [
            f"{k:<16} n={v['count']:<6} mean={v['mean_ms']:>8.3f}ms "
            f"ema={v['ema_ms']:>8.3f}ms max={v['max_ms']:>8.3f}ms"
            for k, v in self.report().items()
        ]
        return "\n".join(rows)


class MetricsLog:
    """Structured JSON-lines metrics sink (file or in-memory)."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.records: list[dict] = []
        self._fh = open(path, "a") if path else None

    def log(self, kind: str, **fields):
        rec = {"t": time.time(), "kind": kind, **fields}
        self.records.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def by_kind(self, kind: str) -> list[dict]:
        return [r for r in self.records if r["kind"] == kind]


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace of everything inside the block (XLA + Pallas)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Per-chip peak HBM bandwidth (bytes/s) by generation; the ICP kernel is
# HBM-bound so bandwidth is the roofline that matters for it.
HBM_PEAK_BYTES_PER_S = {
    "v4": 1.2e12,
    "v5e": 8.19e11,
    "v5p": 2.77e12,
    "v6e": 1.64e12,
}

# Per-chip peak bf16 MXU throughput (FLOP/s) — the Hamming sign-matmul
# kernel is compute-bound (arithmetic intensity ~1000 FLOPs/byte), so the
# MXU roofline binds for it.
MXU_PEAK_FLOPS = {
    "v4": 2.75e14,
    "v5e": 1.97e14,
    "v5p": 4.59e14,
    "v6e": 9.18e14,
}

# Per-chip peak VPU throughput (f32 FLOP/s): 8x128 vector lanes x 4 ALUs
# at the core clock implied by the MXU peak (peak_bf16 / (n_mxu*128*128*2)
# cycles). The ICP stencil kernel's windowed-bilinear accumulation is
# elementwise VPU work — for it THIS is the honest compute ceiling, not
# the MXU number (a (2R+2)^2-term displacement stencil cannot ride the
# systolic array).
VPU_PEAK_FLOPS = {
    "v4": 6.9e12,
    "v5e": 6.2e12,
    "v5p": 7.2e12,
    "v6e": 14.3e12,
}


def tpu_generation(default: str = "v5e") -> str:
    """Best-effort TPU generation from the attached device's device_kind."""
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # no devices / backend not initialized
        return default
    for gen in ("v6e", "v5p", "v5e", "v4"):
        if gen in kind.replace(" ", "").replace("lite", "e"):
            return gen
    if "v5" in kind:  # "TPU v5 lite" etc.
        return "v5e"
    return default


def roofline(bytes_accessed: int, flops: int, measured_s: float,
             generation: str = "v5e", vpu_flops: int = 0) -> dict:
    """Multi-ceiling roofline: HBM bandwidth, MXU matmul FLOPs, and
    (optionally) VPU elementwise FLOPs.

    `flops` counts MXU (matmul) work; `vpu_flops` counts elementwise
    vector work for kernels whose inner loop is a stencil/map rather than
    a contraction. `fraction` is achieved time vs. the BINDING ceiling
    (max of the lower-bound times) — the honest speed-of-light number
    BASELINE.md:33 asks for.
    """
    bw_peak = HBM_PEAK_BYTES_PER_S[generation]
    fl_peak = MXU_PEAK_FLOPS[generation]
    t_hbm = bytes_accessed / bw_peak
    t_mxu = flops / fl_peak
    t_vpu = vpu_flops / VPU_PEAK_FLOPS[generation]
    sol_s = max(t_hbm, t_mxu, t_vpu)
    bound = "hbm"
    if t_mxu == sol_s:
        bound = "mxu"
    if t_vpu == sol_s and t_vpu > t_hbm and t_vpu > t_mxu:
        bound = "vpu"
    out = {
        "measured_us": round(measured_s * 1e6, 1),
        "sol_us": round(sol_s * 1e6, 1),
        "fraction": round(sol_s / max(measured_s, 1e-12), 4),
        "bound": bound,
        "achieved_gbps": round(bytes_accessed / max(measured_s, 1e-12) / 1e9, 1),
        "achieved_tflops": round(flops / max(measured_s, 1e-12) / 1e12, 2),
        "generation": generation,
    }
    if vpu_flops:
        out["achieved_vpu_tflops"] = round(
            vpu_flops / max(measured_s, 1e-12) / 1e12, 2
        )
    return out


def speed_of_light(bytes_accessed: int, measured_s: float,
                   generation: str = "v5e") -> dict:
    """Roofline fraction for an HBM-bound kernel.

    Returns {"achieved_gbps", "peak_gbps", "fraction", "sol_s"}.
    """
    peak = HBM_PEAK_BYTES_PER_S[generation]
    achieved = bytes_accessed / max(measured_s, 1e-12)
    return {
        "achieved_gbps": round(achieved / 1e9, 1),
        "peak_gbps": round(peak / 1e9, 1),
        "fraction": round(achieved / peak, 4),
        "sol_s": bytes_accessed / peak,
    }
