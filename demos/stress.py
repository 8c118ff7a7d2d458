"""Stress battle: two armies march into each other and fight.

Mirrors the reference's scripts/test_stress.py (2 x 256 units on a
4x4-chunk map, ref: test_stress.py:46-50) but scales to any army size —
the default matches the reference; `--units 5000` reproduces the
north-star 10k battle. Prints a perf report per simulated second.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
from permafrost_engine_tpu.game.engine import Engine


def build(units_per_side: int) -> Engine:
    # arena sized to the workload (dense arenas pay for dead padding)
    cfg = EngineConfig(max_ents=max(1024, 2 * units_per_side + 256))
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    rng = np.random.default_rng(0)

    def army(x0):
        files = max(8, int(np.sqrt(units_per_side) * 0.8))
        fx = (np.arange(units_per_side) % files) * 4.0
        fz = (np.arange(units_per_side) // files) * 3.0
        return np.stack([
            x0 + fx + (rng.random(units_per_side) - 0.5),
            300.0 + fz + (rng.random(units_per_side) - 0.5)], 1).astype(np.float32)

    ranged = rng.random(units_per_side) < 0.2
    a = eng.spawn_batch(army(150.0), faction=0, max_speed=20.0, hp=150.0,
                        is_ranged=ranged,
                        attack_range=np.where(ranged, 40.0, 5.0))
    b = eng.spawn_batch(army(800.0), faction=1, max_speed=20.0, hp=150.0,
                        is_ranged=ranged,
                        attack_range=np.where(ranged, 40.0, 5.0))
    eng.move(a, (850.0, 450.0))
    eng.move(b, (160.0, 450.0))
    return eng


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=256, help="units per side")
    ap.add_argument("--seconds", type=int, default=20, help="sim seconds")
    args = ap.parse_args()

    eng = build(args.units)
    t0 = time.perf_counter()
    eng.step_scan(60)  # compile + first second
    print(f"compile+first second: {time.perf_counter() - t0:.1f}s")

    for s in range(args.seconds - 1):
        t0 = time.perf_counter()
        eng.step_scan(60)
        dt = time.perf_counter() - t0
        alive = int(np.asarray(eng.state.ents.alive).sum())
        hp = float(np.asarray(eng.state.ents.hp).clip(0).sum())
        deaths = sum(1 for e in eng.events if e[0] == "entity_death")
        print(f"t={s + 2:3d}s  {60 / dt:7.1f} fps  alive={alive:6d} "
              f"deaths={deaths:5d} total_hp={hp:9.0f}")


if __name__ == "__main__":
    main()
