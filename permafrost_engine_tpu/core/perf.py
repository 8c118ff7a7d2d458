"""Hierarchical profiler + tick statistics.

The reference instruments nearly every hot function with PERF_PUSH/POP
macros into per-thread entry rings, reports name/ms/parent per frame, and
adds GPU timestamp queries resolved N frames late
(ref: src/perf.h:47-168, src/perf.c). The TPU analogue:

* host-side hierarchical scopes (`with perf.scope("move_tick")`)
* per-frame reports with parent indices, same shape as `struct perf_info`
* device work is measured at the dispatch boundary (block_until_ready
  deltas) and via `jax.profiler` trace hooks for deep dives

Hardware-counter sampling (perf_event_open, ref: perf.c:185-232) has no
user-space equivalent for TPUs; per-kernel timing buckets stand in.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PerfEntry:
    __slots__ = ("name", "ms", "parent")

    def __init__(self, name: str, ms: float, parent: int):
        self.name = name
        self.ms = ms
        self.parent = parent

    def to_dict(self):
        return {"name": self.name, "ms": self.ms, "parent": self.parent}


class Perf:
    def __init__(self, keep_frames: int = 8):
        self.enabled = True
        self.keep_frames = keep_frames
        self._frames: list[list[PerfEntry]] = []
        self._current: list[PerfEntry] = []
        self._stack: list[int] = []
        self._starts: list[float] = []
        self._frame_start = 0.0
        self._frame_ms = 0.0
        self.counters: dict[str, float] = defaultdict(float)

    # -- frame lifecycle -----------------------------------------------------

    def begin_tick(self) -> None:
        if self._current:
            self._frames.append(self._current)
            self._frames = self._frames[-self.keep_frames:]
        now = time.perf_counter()
        self._frame_ms = (now - self._frame_start) * 1e3 if self._frame_start else 0.0
        self._frame_start = now
        self._current = []
        self._stack = []
        self._starts = []

    @contextlib.contextmanager
    def scope(self, name: str):
        """PERF_PUSH/POP pair (ref: perf.h:47-82)."""
        if not self.enabled:
            yield
            return
        parent = self._stack[-1] if self._stack else -1
        idx = len(self._current)
        self._current.append(PerfEntry(name, 0.0, parent))
        self._stack.append(idx)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._current[idx].ms = (time.perf_counter() - t0) * 1e3
            self._stack.pop()

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    @contextlib.contextmanager
    def device_trace(self, logdir: str):
        """Capture a jax.profiler trace for per-kernel deep dives — the TPU
        analogue of the reference's GPU timestamp queries
        (ref: perf.h:155-163); view with tensorboard/xprof."""
        import jax

        with jax.profiler.trace(logdir):
            yield

    # -- reports (ref: Perf_Report, pf.prev_frame_perfstats) -------------------

    def prev_frame_ms(self) -> float:
        return self._frame_ms

    def prev_frame_perfstats(self) -> list[dict]:
        if not self._frames:
            return []
        return [e.to_dict() for e in self._frames[-1]]

    def report_tree(self) -> str:
        out = []
        entries = self._frames[-1] if self._frames else self._current
        def depth(i):
            d, p = 0, entries[i].parent
            while p >= 0:
                d += 1
                p = entries[p].parent
            return d
        for i, e in enumerate(entries):
            out.append(f"{'  ' * depth(i)}{e.name}: {e.ms:.3f} ms")
        return "\n".join(out)
