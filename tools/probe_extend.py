"""Perf probe: attribute the one-time post-structure-drop stall.

Reproduces the bench's mid-fight structure drop and prints the host
counters (occ fetch / extend plan / install flow / install LOS / field
batch) for the first windows after the drop — the blk_extend_ms
attribution probe_obstacle.py lacks.

Run on the real TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_extend.py
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


def window(eng, frames=120):
    c0 = dict(eng.perf.counters)
    s0 = dict(eng.nav.stats)
    t0 = time.perf_counter()
    eng.step(frames)
    jax.block_until_ready(eng.state.ents.pos)
    wall = (time.perf_counter() - t0) * 1e3
    dc = {k: round(v - c0.get(k, 0.0), 1)
          for k, v in eng.perf.counters.items()
          if abs(v - c0.get(k, 0.0)) > 0.05}
    ds = {k: round(v - s0.get(k, 0), 1)
          for k, v in eng.nav.stats.items()
          if isinstance(v, (int, float)) and abs(v - s0.get(k, 0)) > 0.05}
    return {"fps": round(frames / wall * 1e3, 1), "wall_ms": round(wall, 0),
            "counters": dc, "nav_stats": ds}


def main():
    from bench import (alive_count, build_battle, fast_forward_until,
                       place_midfight_structures)
    eng = build_battle(terrain=True)
    n0 = alive_count(eng)
    eng.step(60)
    fast_forward_until(eng, lambda a: a < n0)
    eng.step_scan(300)

    out = {"pre_drop": window(eng)}
    t0 = time.perf_counter()
    place_midfight_structures(eng)
    out["drop_ms"] = round((time.perf_counter() - t0) * 1e3, 0)
    for i in range(3):
        out[f"post_drop_{i}"] = window(eng)
    print(json.dumps(out))
    with open("/tmp/probe_extend.json", "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
