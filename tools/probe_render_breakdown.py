"""Probe: per-pass render cost attribution at a given resolution.

Uses SceneRenderer's render_log (pf.debug.render_log_mask bit 1: each
pass block_until_ready-synced and wall-timed) plus overlays on/off A/B
to attribute the frame: geometry soup, shadow pass, raster, shade,
water, host-side overlays/HUD/UI.

Usage: python tools/probe_render_breakdown.py [--w 640] [--h 384]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--ents", type=int, default=1000)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from probe_render import build
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
    r.render(cam, faction_pov=0)
    print(f"first frame: {time.perf_counter() - t0:.1f} s", flush=True)

    # no-overlay steady state
    times = []
    for _ in range(args.frames):
        eng._frame += 1
        t0 = time.perf_counter()
        r.render(cam, faction_pov=0, overlays=False)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"render no-overlays p50: {np.median(times):.1f} ms", flush=True)

    times = []
    for _ in range(args.frames):
        eng._frame += 1
        t0 = time.perf_counter()
        r.render(cam, faction_pov=0)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"render full p50: {np.median(times):.1f} ms", flush=True)

    # per-pass breakdown (sync per pass: sums can exceed pipelined total)
    from permafrost_engine_tpu.core.settings import SettingType
    eng.settings.create("pf.debug.render_log_mask", SettingType.INT, 3,
                        persist=False)
    for _ in range(4):
        eng._frame += 1
        r.render(cam, faction_pov=0)
    for rec in list(r.render_log)[-3:]:
        print("passes:", rec, flush=True)

    # shadow cache off-frame cost vs cached
    t0 = time.perf_counter()
    r.render(cam, faction_pov=0)   # same frame: shadow cached
    print(f"same-frame (shadow cached): "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
