"""Tracing / profiling / live stats.

Reference behaviors replaced (SURVEY §5): Superluminal CPU spans
(PROFILE_START/END, Include/Common.h:77-83), GPUProfileScope debug labels
around each pass (Common.h:88-109), and the ImGui FPS/VRAM HUD
(Source/Main.cpp:228-237).  TPU-native: ``span`` emits
``jax.profiler.TraceAnnotation``s (visible in perfetto/xprof captures) plus
wall-clock logs; :class:`FrameStats` keeps the rolling FPS / frame-ms HUD;
``device_memory_stats`` reports live HBM.
"""

from __future__ import annotations

import collections
import contextlib
import logging
import time
from typing import Dict, Optional

import jax

log = logging.getLogger("vri_tpu")


@contextlib.contextmanager
def span(name: str, log_ms: bool = False):
    """Profiling span: shows up in JAX profiler traces and (optionally) logs
    wall time — the Superluminal PROFILE_START/END + GPUProfileScope analog."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if log_ms:
        log.info("[span] %s: %.2f ms", name, 1e3 * (time.perf_counter() - t0))


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


class FrameStats:
    """Rolling frame-time stats (the ImGui FPS/frame-ms display analog)."""

    def __init__(self, window: int = 64):
        self.times = collections.deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def frame_ms(self) -> float:
        if not self.times:
            return 0.0
        return 1e3 * sum(self.times) / len(self.times)

    @property
    def fps(self) -> float:
        ms = self.frame_ms
        return 1000.0 / ms if ms > 0 else 0.0

    def summary(self) -> str:
        return f"{self.fps:.1f} fps ({self.frame_ms:.2f} ms)"


def device_memory_stats() -> Dict[str, int]:
    """Live HBM usage per device (the VMA budget display analog,
    Source/Main.cpp:231-237)."""
    out: Dict[str, int] = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:  # noqa: BLE001 — CPU devices have no stats
            s = None
        if s:
            out[str(d)] = int(s.get("bytes_in_use", 0))
    return out
