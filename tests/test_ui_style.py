"""Per-widget-class UI style mirror (script/ui_style.py): typed getset
surface, scoped ButtonStyle overrides landing on exactly their widgets,
compositor consumption, and persistence.

Ports the reference's disabled-action-pad styling block as the acceptance
test (ref: scripts/rts/views/action_pad_window.py:62-71 +
src/script/py_ui_style.c:595-668).
"""

import numpy as np
import pytest


@pytest.fixture
def ctx():
    import permafrost_engine_tpu.script.pf as pf
    from permafrost_engine_tpu.core.config import EngineConfig

    cfg = EngineConfig(max_ents=16, chunks_r=1, chunks_c=1, num_layers=1,
                       max_flocks=4, max_projectiles=4,
                       field_slab_slots=4, los_slab_slots=4)
    c = pf.init(cfg)
    yield c
    # restore mutated global styles for other tests
    from permafrost_engine_tpu.script import ui_style
    fresh = ui_style.make_default_styles()
    for k, v in ui_style.STYLES.items():
        v.from_dict(fresh[k].to_dict())


def test_typed_style_attributes():
    import permafrost_engine_tpu.script.pf as pf

    assert isinstance(pf.button_style, pf.UIButtonStyle)
    pf.button_style.normal = (1, 2, 3)          # rgb -> rgba
    assert pf.button_style.normal == (1, 2, 3, 255)
    pf.button_style.padding = (5, 6)
    assert pf.button_style.padding == (5.0, 6.0)
    pf.button_style.normal = "assets/icon.png"  # image item allowed
    assert pf.button_style.normal == "assets/icon.png"
    with pytest.raises(AttributeError):
        pf.button_style.no_such_knob = 1
    with pytest.raises(AttributeError):
        _ = pf.slider_style.text_normal          # not a slider knob
    # the full reference widget-object surface exists
    for name in ("button_style", "contextual_button_style",
                 "menu_button_style", "selectable_style", "combo_style",
                 "option_style", "checkbox_style",
                 "scrollbar_horizontal_style", "scrollbar_vertical_style",
                 "edit_style", "property_style", "slider_style",
                 "progress_style", "window_style"):
        assert hasattr(pf, name), name
    # restore
    from permafrost_engine_tpu.script import ui_style
    fresh = ui_style.make_default_styles()
    for k, v in ui_style.STYLES.items():
        v.from_dict(fresh[k].to_dict())


DISABLED_BG = (40, 40, 40, 255)


def _render(ctx, win):
    from permafrost_engine_tpu.render.ui_compose import compose_ui

    frame = np.zeros((270, 480, 3), np.uint8)
    win.show()
    win._render()
    return compose_ui(frame, ctx.ui_windows, (1920, 1080))


def test_scoped_button_style_lands_on_its_widget(ctx):
    """The reference's disabled-button block: the override colors exactly
    the buttons recorded inside the `with`, and pf.button_style is
    restored after (ref: action_pad_window.py:62-71 +
    common/button_style_ctx.py)."""
    import permafrost_engine_tpu.script.pf as pf
    import scripts.common.button_style_ctx as btc

    default_bg = pf.button_style.normal

    class Pad(pf.Window):
        def __init__(self):
            super().__init__("Pad", (0, 0, 800, 200), pf.NK_WINDOW_BORDER)

        def update(self):
            self.layout_row_static(80, 300, 2)
            with btc.ButtonStyle(normal=DISABLED_BG, hover=DISABLED_BG,
                                 active=DISABLED_BG,
                                 text_normal=(60, 60, 60, 255)):
                self.button_label("disabled")
            self.button_label("enabled")

    win = Pad()
    img = _render(ctx, win)
    assert pf.button_style.normal == default_bg, "style must be restored"

    # draw list carries per-button style snapshots
    styles = [item[2] for item in win.draw_list if item[0] == "button"]
    assert styles[0]["normal"] == DISABLED_BG
    assert styles[1]["normal"] == default_bg

    # pixel check: the style color must dominate each button's region
    # (single-pixel samples can land on anti-aliased label text); virtual
    # 1920x1080 -> 480x270 is a /4 scale
    def _dominant(x0, x1):
        sx = sy = 0.25
        crop = img[int(10 * sy):int(75 * sy), int(x0 * sx):int(x1 * sx)]
        colors, counts = np.unique(
            crop.reshape(-1, 3), axis=0, return_counts=True)
        return tuple(colors[counts.argmax()])

    assert _dominant(10, 290) == DISABLED_BG[:3]
    assert _dominant(320, 590) == default_bg[:3]


def test_global_widget_styles_drive_compositor(ctx):
    """Setting pf.checkbox_style / pf.progress_style globally recolors
    those widgets in the composited frame."""
    import permafrost_engine_tpu.script.pf as pf

    pf.checkbox_style.cursor_normal = (250, 10, 10)
    pf.progress_style.cursor_normal = (10, 250, 10)

    class W(pf.Window):
        def __init__(self):
            super().__init__("W", (0, 0, 800, 300), pf.NK_WINDOW_BORDER)

        def update(self):
            self.layout_row_static(80, 300, 1)
            self._widget_state[("check", "cb")] = True
            self.checkbox("cb", True)
            self.layout_row_static(80, 300, 1)
            self.progress(100, 100)

    img = _render(ctx, W())
    assert (img[..., 0] > 200).any() and (img[..., 1] < 60)[
        img[..., 0] > 200].any(), "red checkbox cursor missing"
    green = (img[..., 1] > 200) & (img[..., 0] < 60)
    assert green.any(), "green progress fill missing"


def test_styles_persist_through_script_state(ctx):
    import permafrost_engine_tpu.script.pf as pf
    from permafrost_engine_tpu.script import ui_style

    pf.button_style.normal = (9, 9, 9, 9)
    data = ui_style.styles_to_dict(ui_style.STYLES)
    fresh = ui_style.make_default_styles()
    ui_style.styles_from_dict(fresh, data)
    assert fresh["button_style"].normal == (9, 9, 9, 9)
