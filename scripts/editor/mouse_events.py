"""Mouse-over-map edge events (ref: scripts/editor/mouse_events.py):
fires ENTERED/EXITED when the cursor crosses between UI/minimap and the
world viewport, so paint controllers know when clicks mean painting."""

import permafrost_engine_tpu.script.pf as pf

from scripts.editor.constants import (
    EVENT_MOUSE_ENTERED_MAP,
    EVENT_MOUSE_EXITED_MAP,
)

mouse_over_map = None


def _on_mousemove(event):
    global mouse_over_map
    now = not pf.mouse_over_ui() and not pf.mouse_over_minimap()
    if now != mouse_over_map:
        pf.global_event(EVENT_MOUSE_ENTERED_MAP if now
                        else EVENT_MOUSE_EXITED_MAP, None)
        mouse_over_map = now


def install():
    global mouse_over_map
    mouse_over_map = not pf.mouse_over_ui() and not pf.mouse_over_minimap()
    pf.register_event_handler(pf.SDL_MOUSEMOTION, _on_mousemove)
