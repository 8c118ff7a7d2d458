"""Live terminal battle viewer: the presentation stack end-to-end.

Runs a battle and renders the minimap raster + draw-buffer stats to the
terminal every simulated second — the headless stand-in for the
reference's render thread consuming the draw queue.

Usage: python demos/viewer.py [--units 64] [--seconds 30] [--tpu]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

# 4-bit-ish terminal palette by dominant channel
_CHARS = " .:-=+*#%@"


def ansi_frame(img: np.ndarray, width: int = 64) -> str:
    """Downsample an RGB minimap to colored terminal blocks."""
    step = max(1, img.shape[1] // width)
    small = img[::2 * step, ::step]
    rows = []
    for row in small:
        out = []
        for px in row:
            r, g, b = (int(x) for x in px)
            if r == g == b == 0:
                out.append(" ")
            else:
                code = 16 + (r * 5 // 255) * 36 + (g * 5 // 255) * 6 + (b * 5 // 255)
                out.append(f"\x1b[48;5;{code}m \x1b[0m")
        rows.append("".join(out))
    return "\n".join(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--units", type=int, default=64)
    ap.add_argument("--seconds", type=int, default=20)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--fog-pov", type=int, default=None)
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from demos.stress import build
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.draw import draw_buffers, minimap_raster

    eng = build(args.units)
    cam = Camera()
    cam.pos = np.array([eng.cfg.world_w / 2, 300.0, eng.cfg.world_h / 2 - 100])

    for s in range(args.seconds):
        eng.step(60)
        img = minimap_raster(eng, size=128, faction_pov=args.fog_pov)
        buf = draw_buffers(eng, cam, alpha=eng.render_alpha)
        vis = int(np.asarray(buf["visible"]).sum())
        alive = int(np.asarray(eng.state.ents.alive).sum())
        lods = np.bincount(
            np.asarray(buf["lod"])[np.asarray(buf["visible"])], minlength=3)
        print(f"\x1b[2J\x1b[H", end="")
        print(ansi_frame(img))
        print(f"t={s + 1:3d}s alive={alive} visible={vis} "
              f"lod0/1/2={lods[0]}/{lods[1]}/{lods[2]} "
              f"deaths={sum(1 for e in eng.events if e[0] == 'entity_death')}")
    print("VIEWER DONE")


if __name__ == "__main__":
    main()
