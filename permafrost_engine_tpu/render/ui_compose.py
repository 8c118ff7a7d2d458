"""UI draw-list -> pixels: the nuklear rasterizer analogue.

The reference records nuklear draw commands and rasterizes them in a GL
pass (ref: /root/reference/src/render/gl_ui.c, src/ui.c:163-267 virtual-
resolution layout). Here windows keep their headless draw-list contract
(script/ui.py) and this module composites them onto a rendered frame on
the host: panels, title bars, and widgets (labels, buttons, checkboxes,
options, sliders, progress bars, text edits) drawn with PIL in virtual-
resolution coordinates scaled to the frame.
"""

from __future__ import annotations

import numpy as np

from permafrost_engine_tpu.script.ui import (
    TITLE_H,
    WINDOW_BORDER,
    WINDOW_TITLE,
    Window,
    layout_window,
)

PANEL_RGBA = (38, 38, 42, 215)
TITLE_RGBA = (52, 70, 98, 235)
WIDGET_BG = (58, 58, 64, 255)
ACCENT = (92, 144, 210, 255)
TEXT = (212, 212, 214, 255)


def compose_ui(frame: np.ndarray, windows: dict[str, Window],
               virtual_resolution=(1920, 1080)) -> np.ndarray:
    """Composite all shown windows onto u8[h, w, 3]; returns a new array."""
    shown = [w for w in windows.values() if w.shown]
    if not shown:
        return frame
    from PIL import Image, ImageDraw, ImageFont

    h, w = frame.shape[:2]
    vw, vh = virtual_resolution
    sx, sy = w / vw, h / vh
    base = Image.fromarray(frame).convert("RGBA")
    layer = Image.new("RGBA", (w, h), (0, 0, 0, 0))
    d = ImageDraw.Draw(layer)
    font = ImageFont.load_default()

    def rect(r, fill, outline=None):
        x, y, rw, rh = r
        d.rectangle([x * sx, y * sy, (x + rw) * sx, (y + rh) * sy],
                    fill=fill, outline=outline)

    def text(r, s, color=TEXT, pad=3):
        x, y, _rw, rh = r
        d.text((x * sx + pad, y * sy + max((rh * sy - 10) / 2, 0)),
               str(s), fill=color, font=font)

    for win in shown:
        wx, wy, ww, wh = win.rect
        rect((wx, wy, ww, wh), PANEL_RGBA,
             outline=(20, 20, 20, 255) if win.flags & WINDOW_BORDER else None)
        if win.flags & WINDOW_TITLE:
            rect((wx, wy, ww, TITLE_H), TITLE_RGBA)
            text((wx, wy, ww, TITLE_H), win.name)
        for kind, item, r in layout_window(win):
            if kind == "label":
                c = item[2]
                text(r, item[1],
                     (c[0], c[1], c[2], 255) if c else TEXT)
            elif kind == "button":
                rect(r, WIDGET_BG, outline=(120, 120, 126, 255))
                text(r, item[1])
            elif kind == "checkbox":
                x, y, rw, rh = r
                box = (x, y + rh * 0.15, rh * 0.7, rh * 0.7)
                rect(box, WIDGET_BG, outline=(120, 120, 126, 255))
                val = win._widget_state.get(("check", item[1]), item[2])
                if val:
                    rect((box[0] + box[2] * 0.25, box[1] + box[3] * 0.25,
                          box[2] * 0.5, box[3] * 0.5), ACCENT)
                text((x + rh * 0.9, y, rw - rh, rh), item[1])
            elif kind == "option":
                x, y, rw, rh = r
                rect((x, y + rh * 0.25, rh * 0.5, rh * 0.5),
                     ACCENT if item[2] else WIDGET_BG,
                     outline=(120, 120, 126, 255))
                text((x + rh * 0.7, y, rw - rh, rh), item[1])
            elif kind == "slider":
                _, minv, cur, maxv, _step = item
                x, y, rw, rh = r
                rect((x, y + rh * 0.4, rw, rh * 0.2), WIDGET_BG)
                frac = 0.0 if maxv <= minv else (cur - minv) / (maxv - minv)
                kx = x + frac * rw
                rect((kx - 3, y + rh * 0.15, 6, rh * 0.7), ACCENT)
            elif kind == "progress":
                _, cur, maxv = item
                x, y, rw, rh = r
                rect(r, WIDGET_BG)
                frac = 0.0 if maxv <= 0 else min(cur / maxv, 1.0)
                rect((x, y, rw * frac, rh), ACCENT)
            elif kind == "text_edit":
                rect(r, (24, 24, 26, 255), outline=(120, 120, 126, 255))
                text(r, item[2] + "_")
            elif kind == "group":
                text(r, f"[{item[1]}]")
            # "image"/"spacer"/"row" need no pixels here

    out = Image.alpha_composite(base, layer).convert("RGB")
    return np.asarray(out, np.uint8)
