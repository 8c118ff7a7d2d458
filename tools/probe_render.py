"""Probe: TPU rasterizer frame cost at a given resolution.

Times SceneRenderer.render() on the battle-map demo scene (terrain +
skinned entities + water + shadows + HUD). render() ends in a
synchronous device->host image fetch, so each call is a true
wall-clock frame (enqueue-only timing is impossible here).

Usage: python tools/probe_render.py [--w 1280] [--h 720] [--ents 1000]
       [--frames 30] [--sim]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build(n_ents: int):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
    from permafrost_engine_tpu.game.engine import Engine

    sys.path.insert(0, "/root/repo/tools")
    from mapgen import make_battle_map

    cfg = EngineConfig(max_ents=n_ents + 64, skin_joints=32)
    eng = Engine(cfg)
    eng.load_map_data(make_battle_map())
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    rng = np.random.default_rng(0)
    half = n_ents // 2
    for f, x0 in ((0, 250.0), (1, 600.0)):
        pos = np.stack([rng.uniform(x0, x0 + 160, half),
                        rng.uniform(300, 700, half)], 1).astype(np.float32)
        uids = eng.spawn_batch(pos, faction=f, max_speed=20.0,
                               vision_range=80.0, hp=200.0)
        eng.move(uids, (600.0 - x0 + 250.0, 512.0))
    return eng


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--ents", type=int, default=1000)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--sim", action="store_true",
                    help="also measure sim+render co-residency")
    args = ap.parse_args()

    eng = build(args.ents)
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.scene import SceneRenderer

    cam = Camera()
    cam.pos = np.array([eng.cfg.world_w / 2, 220.0,
                        eng.cfg.world_h / 2 + 180.0])
    cam.pitch, cam.yaw = -50.0, 90.0

    eng.step(30)
    r = SceneRenderer(eng, w=args.w, h=args.h, maxi=args.ents,
                      shadows=True, reflections=True)
    t0 = time.perf_counter()
    img = r.render(cam, faction_pov=0)
    print(f"first frame (compiles): {time.perf_counter() - t0:.1f} s, "
          f"shape {img.shape}, mean {img.mean():.1f}")

    times = []
    for i in range(args.frames):
        eng._frame += 1  # advance shadow-pass cache key as the loop would
        t0 = time.perf_counter()
        r.render(cam, faction_pov=0)
        times.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.median(times))
    print(f"render-only {args.w}x{args.h}: p50 {p50:.1f} ms "
          f"({1000.0 / p50:.1f} fps), p90 {np.percentile(times, 90):.1f} ms")

    if args.sim:
        for dec in (4, 2):
            t0 = time.perf_counter()
            frames = 120
            for _ in range(frames // dec):
                eng.step(dec)
                r.render(cam, faction_pov=0)
            import jax
            jax.block_until_ready(eng.state.ents.pos)
            dt = time.perf_counter() - t0
            print(f"sim+render (render every {dec} frames): "
                  f"{frames / dt:.1f} sim fps")


if __name__ == "__main__":
    main()
