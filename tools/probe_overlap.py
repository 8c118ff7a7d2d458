"""Small-scale CPU reproduction of the choke interpenetration (bench
overlap_frac ~0.5 at obstacle contact): two melee armies meet head-on;
prints the overlap fraction + depth percentiles over time so contact-
constraint changes can be iterated in seconds instead of 15-minute TPU
battles. Usage: python tools/probe_overlap.py [--units 256]"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
from permafrost_engine_tpu.game.engine import Engine


def overlap_stats(eng) -> tuple[float, float, float]:
    from permafrost_engine_tpu.core.config import CombatState
    live = (np.asarray(eng.state.ents.alive)
            & (np.asarray(eng.state.ents.combatstate) != CombatState.CORPSE))
    pos = np.asarray(eng.state.ents.pos)[live]
    rad = np.asarray(eng.state.ents.radius)[live]
    n = len(pos)
    if n < 2:
        return 0.0, 0.0, 0.0
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    comb = (rad[:, None] + rad[None, :]) * 0.5          # bench's "bad" bar
    bad = (d < comb).any(axis=1)
    tang = rad[:, None] + rad[None, :]
    depth = np.maximum(tang - d, 0.0).max(axis=1)       # deepest overlap/unit
    return float(bad.mean()), float(np.median(depth)), float(depth.max())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=256)
    ap.add_argument("--seconds", type=int, default=30)
    args = ap.parse_args()

    n = args.units
    cfg = EngineConfig(max_ents=max(1024, 2 * n + 64))
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    rng = np.random.default_rng(0)

    def army(x0):
        files = 16
        fx = (np.arange(n) % files) * 4.0
        fz = (np.arange(n) // files) * 3.0
        return np.stack([
            x0 + fx + (rng.random(n) - 0.5),
            200.0 + fz + (rng.random(n) - 0.5)], 1).astype(np.float32)

    a = eng.spawn_batch(army(150.0), faction=0, max_speed=20.0,
                        attack_range=5.0, hp=200.0)
    b = eng.spawn_batch(army(300.0), faction=1, max_speed=20.0,
                        attack_range=5.0, hp=200.0)
    eng.move(a, (350.0, 220.0))
    eng.move(b, (120.0, 220.0))

    for s in range(args.seconds):
        eng.step(60)
        frac, dmed, dmax = overlap_stats(eng)
        alive = int(np.asarray(eng.state.ents.alive).sum())
        print(f"t={s + 1:3d}s overlap_frac={frac:.3f} "
              f"depth_med={dmed:.2f} depth_max={dmax:.2f} alive={alive}",
              flush=True)


if __name__ == "__main__":
    main()
