"""Obstacle-battle phase probe: where do march/contact frames go?

Builds the bench's obstacle battle, measures the march and contact phases
like bench.py, and prints the engine's internal host-side counters
(blocker snapshot/update/route/replan, seek/chase refresh, field batch,
delta drains) per phase — the attribution bench.py's fps numbers lack.

Run on the real TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_obstacle.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def counters_delta(eng, before: dict) -> dict:
    out = {}
    for k, v in eng.perf.counters.items():
        d = v - before.get(k, 0.0)
        if abs(d) > 0.05:
            out[k] = round(d, 1)
    return out


def phase(eng, name: str, frames: int = 120, windows: int = 3) -> dict:
    before = dict(eng.perf.counters)
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        eng.step(frames)
        jax.block_until_ready(eng.state.ents.pos)
        vals.append(frames / (time.perf_counter() - t0))
    wall_ms = windows * frames / np.median(vals) * 1e3
    return {"phase": name, "fps_median": round(float(np.median(vals)), 2),
            "fps_all": [round(v, 1) for v in vals],
            "window_wall_ms": round(wall_ms, 0),
            "host_counters_ms": counters_delta(eng, before)}


def main():
    from bench import build_battle, fast_forward_until, place_midfight_structures, alive_count
    eng = build_battle(terrain=True)
    n0 = alive_count(eng)
    eng.step(60)

    out = {"phases": []}
    out["phases"].append(phase(eng, "march"))
    fast_forward_until(eng, lambda a: a < n0)
    eng.step_scan(300)
    place_midfight_structures(eng)
    out["phases"].append(phase(eng, "contact"))
    out["phases"].append(phase(eng, "contact2"))
    print(json.dumps(out))
    with open("/tmp/probe_obstacle.json", "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
