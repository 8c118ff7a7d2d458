"""Perf probe: steady-state interactive step() decomposition on the
OBSTACLE battle (march phase — no one-time compile stalls).

Attributes the per-frame wall to device_tick / drain_deltas /
host_systems scopes, counts dispatches, and compares micro-batched vs
per-frame vs scan driving plus the per-cadence-class sync tick cost.

Run on the real TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_steady.py
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench


def fps_of(eng, fn, frames=120, windows=3):
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        fn(frames)
        jax.block_until_ready(eng.state.ents.pos)
        vals.append(frames / (time.perf_counter() - t0))
    return [round(v, 1) for v in vals], float(np.median(vals))


def scope_totals(eng, frames=120):
    """Sum perf-scope ms over `frames` frames of step()."""
    totals: dict[str, float] = defaultdict(float)
    # run once untimed (compiles), then measure with a wide archive so
    # every segment's scopes are captured
    eng.step(frames)
    jax.block_until_ready(eng.state.ents.pos)
    eng.perf.keep_frames = 64
    eng.perf._frames = []
    t0 = time.perf_counter()
    eng.step(frames)
    jax.block_until_ready(eng.state.ents.pos)
    wall = (time.perf_counter() - t0) * 1e3
    eng.perf.begin_tick()  # archive the last segment
    nseg = 0
    for fr in eng.perf._frames:
        nseg += 1
        for e in fr:
            totals[e.name] += e.ms
    totals_r = {k: round(v, 1) for k, v in totals.items()}
    return {"wall_ms": round(wall, 1), "segments": nseg,
            "scope_ms": totals_r,
            "unattributed_ms": round(
                wall - sum(totals[k] for k in ("device_tick", "drain_deltas",
                                               "host_systems")), 1)}


def main():
    eng = bench.build_battle(terrain=True)
    eng.step(60)   # warmup/compile

    out = {}
    out["march_breakdown"] = scope_totals(eng)
    fps_all, fps_med = fps_of(eng, eng.step)
    out["fps_micro"] = {"all": fps_all, "median": round(fps_med, 1)}
    eng.micro_batching = False
    fps_all, fps_med = fps_of(eng, eng.step)
    out["fps_perframe"] = {"all": fps_all, "median": round(fps_med, 1)}
    eng.micro_batching = True
    fps_all, fps_med = fps_of(eng, eng.step_scan)
    out["fps_scan"] = {"all": fps_all, "median": round(fps_med, 1)}
    prof = eng.profile_tick(60)
    out["tick_classes"] = prof.get("classes")
    out["tick_ms_mean"] = round(prof.get("ms_mean", 0.0), 3)
    print(json.dumps(out))
    with open("/tmp/probe_steady.json", "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
