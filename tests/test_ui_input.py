"""UI layout / compositing / input-routing tests.

The reference routes SDL events through nuklear widget logic and the
selection system (ref: src/ui.c, src/game/selection.c, py_ui.c). Here the
same behaviors ride layout_window (one geometry pass shared by the pixel
compositor and the router) and pf.inject_* entry points."""

import numpy as np
import pytest

from permafrost_engine_tpu.script import pf
from permafrost_engine_tpu.script.ui import (
    TITLE_H,
    WINDOW_TITLE,
    Window,
    layout_window,
)


class DemoWin(Window):
    def __init__(self):
        super().__init__("demo", (100, 100, 400, 300), flags=WINDOW_TITLE)
        self.clicks = 0
        self.flag = True
        self.speed = 5.0
        self.name_text = ""

    def update(self):
        self.layout_row_dynamic(30, 2)
        self.label("Units:")
        self.label_colored("42", 255, 0, 0)
        self.layout_row_dynamic(30, 1)
        if self.button_label("Attack"):
            self.clicks += 1
        self.layout_row_dynamic(30, 1)
        self.flag = self.checkbox("fog", self.flag)
        self.layout_row_dynamic(30, 1)
        self.speed = self.slider_float(0.0, self.speed, 10.0, 0.5)
        self.layout_row_dynamic(30, 1)
        self.name_text = self.text_edit("name", self.name_text)


@pytest.fixture()
def ctx():
    c = pf.context()
    saved = dict(c.ui_windows)
    c.ui_windows.clear()
    yield c
    c.ui_windows.clear()
    c.ui_windows.update(saved)


def test_layout_places_rows_and_columns(ctx):
    w = DemoWin()
    placed = layout_window(w)
    kinds = [p[0] for p in placed]
    assert kinds == ["label", "label", "button", "checkbox", "slider",
                     "text_edit"]
    (_, _, r0), (_, _, r1) = placed[0], placed[1]
    assert r0[1] == r1[1] and r1[0] > r0[0]        # same row, next column
    assert placed[2][2][1] > r0[1]                 # button on a lower row
    assert r0[1] >= 100 + TITLE_H                  # below the title bar


def test_click_routes_to_button_checkbox_slider_text(ctx):
    w = DemoWin()
    w.show()
    vres = ctx.ui.virtual_resolution
    placed = {p[0]: p[2] for p in layout_window(w)}

    def mid(r):
        return (r[0] + r[2] / 2, r[1] + r[3] / 2)

    # button
    assert ctx.ui.route_click(ctx.ui_windows, mid(placed["button"]), vres)
    w._render()
    assert w.clicks == 1
    # checkbox toggles off
    ctx.ui.route_click(ctx.ui_windows, mid(placed["checkbox"]), vres)
    w._render()
    assert w.flag is False
    # slider: click at 25% of its track (step 0.5 -> 2.5)
    r = placed["slider"]
    ctx.ui.route_click(ctx.ui_windows, (r[0] + r[2] * 0.25, r[1] + r[3] / 2),
                       vres)
    w._render()
    assert abs(w.speed - 2.5) < 1e-6
    # text edit: focus + typing + enter commits
    ctx.ui.route_click(ctx.ui_windows, mid(placed["text_edit"]), vres)
    assert pf.ui_text_edit_has_focus()
    pf.inject_text_input("hero\b!")
    w._render()
    assert w.name_text == "her!"
    pf.inject_text_input("\n")
    assert not pf.ui_text_edit_has_focus()
    # clicking off-window clears focus and reports not-consumed
    assert not ctx.ui.route_click(ctx.ui_windows, (5, 5), vres)


def test_compose_ui_draws_panels(ctx):
    from permafrost_engine_tpu.render.ui_compose import compose_ui
    w = DemoWin()
    w.show()
    frame = np.full((216, 384, 3), 120, np.uint8)
    out = compose_ui(frame, ctx.ui_windows, ctx.ui.virtual_resolution)
    assert out.shape == frame.shape
    # window area darkened by the panel; outside untouched
    assert out[60, 60].mean() < 110                # inside panel
    assert (out[5, 5] == 120).all()                # outside
    assert (out != frame).sum() > 500              # widgets drew something


@pytest.fixture()
def world():
    from permafrost_engine_tpu.core.config import EngineConfig
    from permafrost_engine_tpu.game.engine import Engine
    c = pf.context()
    old = c.engine
    eng = Engine(EngineConfig(max_ents=16))
    eng.add_faction(0)
    c.engine = eng
    saved_windows = dict(c.ui_windows)
    c.ui_windows.clear()
    yield c, eng
    c.engine = old
    c.ui_windows.clear()
    c.ui_windows.update(saved_windows)


def test_world_click_selects_and_orders(world):
    ctx, eng = world
    uids = eng.spawn_batch(np.array([[450.0, 450.0]], np.float32), faction=0,
                           sel_radius=4.0)
    eng.step(1)
    cam = pf.get_active_camera()
    cam.pos = np.array([450.0, 120.0, 450.5])
    cam.pitch, cam.yaw = -89.0, 90.0
    vw, vh = ctx.ui.virtual_resolution
    cam.aspect = vw / vh

    # hover + click select at the screen center (camera is over the unit)
    pf.inject_mouse_motion(vw / 2, vh / 2)
    assert eng.selection.hovered == int(uids[0])
    assert pf.inject_mouse_click(vw / 2, vh / 2) == "select"
    assert eng.selection.selection == [int(uids[0])]

    # armed move order: next left click orders the selection
    orders = []
    from permafrost_engine_tpu.core.events import EventType
    eng.bus.subscribe(EventType.ORDER_ISSUED, lambda a: orders.append(a))
    pf.set_move_on_left_click()
    res = pf.inject_mouse_click(vw / 2 + 200, vh / 2)
    assert res == "order:move"
    eng.bus.service_queue()
    assert orders and orders[0]["mode"] == "move"
    p0 = np.asarray(eng.state.ents.pos)[eng.uid_to_slot[int(uids[0])]].copy()
    eng.step(60)
    p1 = np.asarray(eng.state.ents.pos)[eng.uid_to_slot[int(uids[0])]]
    assert np.linalg.norm(p1 - p0) > 2.0           # it moved

    # drag box select
    eng.selection.clear()
    sel = pf.inject_mouse_drag(vw / 2 - 300, vh / 2 - 300,
                               vw / 2 + 300, vh / 2 + 300)
    assert int(uids[0]) in sel


def test_live_viewer_server_produces_frames_and_routes_input():
    """tools/live_viewer.py: the windowing layer over the render contract
    (frame producer + input forwarding), exercised without sockets."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import live_viewer as lv
    from permafrost_engine_tpu.script import pf

    ctx = pf.context()
    old = ctx.engine
    try:
        eng, cam, a_uids = lv.default_scenario(8)
        srv = lv.LiveServer(eng, cam, w=128, h=128, fps=30.0)
        # one producer iteration inline (no thread): step + render + encode
        srv.running = False
        from PIL import Image
        import io as _io
        with srv.lock:
            eng.step(2)
            img = srv.renderer.render(cam)
        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=85)
        assert len(buf.getvalue()) > 500
        # input routing: a click lands in world coordinates
        # hover straight over unit 0, low enough that the -89-degree pitch
        # offset stays inside its 1u selection radius
        cam.pos = np.array([float(np.asarray(eng.state.ents.pos)[0, 0]),
                            12.0,
                            float(np.asarray(eng.state.ents.pos)[0, 1])])
        cam.pitch, cam.yaw = -89.0, 90.0
        srv.handle_input({"type": "motion", "x": 0.5, "y": 0.5})
        srv.handle_input({"type": "click", "x": 0.5, "y": 0.5, "button": 1})
        assert eng.selection.selection  # the unit under the cursor selected
        before = cam.pos.copy()
        srv.handle_input({"type": "pan", "dx": 10, "dy": 0})
        assert not np.allclose(cam.pos, before)
    finally:
        ctx.engine = old
