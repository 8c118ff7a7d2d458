"""Video settings tab (ref: scripts/common/views/video_settings_window.py):
aspect ratio / resolution / display-mode option rows, vsync + shadows +
water toggles, and an Apply button enabled only when dirty."""

import permafrost_engine_tpu.script.pf as pf

from scripts.common.constants import (
    EVENT_SETTINGS_APPLY,
    EVENT_VIDEO_SETTINGS_CHANGED,
)


class VideoSettingsWindow(pf.Window):

    AR_OPTS = [(16, 9), (16, 10), (4, 3), (21, 9)]
    RES_OPTS_16_9 = [(1920, 1080), (1600, 900), (1366, 768), (1280, 720)]
    MODE_OPTS = ["Windowed", "Fullscreen", "Borderless Windowed"]

    def __init__(self):
        super().__init__("VideoSettings", (0, 0, 540, 360), 0)
        self.ar_idx = 0
        self.res_idx = 0
        self.mode_idx = 0
        self.vsync_on = True
        self.shadows_on = True
        self.water_reflect_on = True
        self.dirty = False

    @property
    def res_opts(self):
        return self.RES_OPTS_16_9

    def update(self):
        def changed():
            pf.global_event(EVENT_VIDEO_SETTINGS_CHANGED, None)

        self.layout_row_dynamic(20, 1)
        self.label("Aspect Ratio:")
        self.layout_row_dynamic(24, len(self.AR_OPTS))
        for i, (num, den) in enumerate(self.AR_OPTS):
            on = self.option_label(f"{num}:{den}", i == self.ar_idx)
            if on and i != self.ar_idx:
                self.ar_idx = i
                changed()

        self.layout_row_dynamic(20, 1)
        self.label("Resolution:")
        self.layout_row_dynamic(24, 2)
        for i, (w, h) in enumerate(self.res_opts):
            on = self.option_label(f"{w}x{h}", i == self.res_idx)
            if on and i != self.res_idx:
                self.res_idx = i
                changed()

        self.layout_row_dynamic(20, 1)
        self.label("Display Mode:")
        self.layout_row_dynamic(24, len(self.MODE_OPTS))
        for i, mode in enumerate(self.MODE_OPTS):
            on = self.option_label(mode, i == self.mode_idx)
            if on and i != self.mode_idx:
                self.mode_idx = i
                changed()

        self.layout_row_dynamic(24, 3)
        for attr, label in (("vsync_on", "VSync"),
                            ("shadows_on", "Shadows"),
                            ("water_reflect_on", "Water Reflections")):
            new = self.checkbox(label, getattr(self, attr))
            if new != getattr(self, attr):
                setattr(self, attr, new)
                changed()

        self.layout_row_dynamic(30, 2)
        self.spacer()
        if self.button_label("Apply Video" if self.dirty else "Applied"):
            if self.dirty:
                pf.global_event(EVENT_SETTINGS_APPLY, "video")
