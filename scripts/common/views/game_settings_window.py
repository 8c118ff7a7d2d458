"""Game settings tab (ref: scripts/common/views/game_settings_window.py):
healthbar mode options, fog-of-war toggle, camera tilt + zoom sliders,
and an Apply button enabled only when dirty."""

import permafrost_engine_tpu.script.pf as pf

from scripts.common.constants import (
    EVENT_GAME_SETTINGS_CHANGED,
    EVENT_SETTINGS_APPLY,
)


class GameSettingsWindow(pf.Window):

    HB_OPTS = ["Never", "Always", "On Hover"]

    def __init__(self):
        super().__init__("GameSettings", (0, 0, 540, 360), 0)
        self.hb_idx = 1
        self.fog_on = True
        self.camera_tilt = -65.0
        self.camera_zoom = 120.0
        self.dirty = False

    def update(self):
        def changed():
            pf.global_event(EVENT_GAME_SETTINGS_CHANGED, None)

        self.layout_row_dynamic(20, 1)
        self.label("Healthbars:")
        self.layout_row_dynamic(24, len(self.HB_OPTS))
        for i, mode in enumerate(self.HB_OPTS):
            on = self.option_label(mode, i == self.hb_idx)
            if on and i != self.hb_idx:
                self.hb_idx = i
                changed()

        self.layout_row_dynamic(24, 1)
        new_fog = self.checkbox("Fog of War", self.fog_on)
        if new_fog != self.fog_on:
            self.fog_on = new_fog
            changed()

        self.layout_row_dynamic(20, 1)
        self.label(f"Camera Tilt: {self.camera_tilt:.0f}")
        self.layout_row_dynamic(24, 1)
        tilt = self.slider_float(-85.0, self.camera_tilt, -25.0, 5.0)
        if tilt != self.camera_tilt:
            self.camera_tilt = tilt
            changed()

        self.layout_row_dynamic(20, 1)
        self.label(f"Camera Zoom: {self.camera_zoom:.0f}")
        self.layout_row_dynamic(24, 1)
        zoom = self.slider_float(60.0, self.camera_zoom, 240.0, 10.0)
        if zoom != self.camera_zoom:
            self.camera_zoom = zoom
            changed()

        self.layout_row_dynamic(30, 2)
        self.spacer()
        if self.button_label("Apply Game" if self.dirty else "Applied"):
            if self.dirty:
                pf.global_event(EVENT_SETTINGS_APPLY, "game")
