"""Video-settings controller (ref:
scripts/common/view_controllers/video_settings_vc.py): loads the saved
pf.video.* values into the view's selection state, tracks a dirty flag on
view changes, and commits through pf.settings_set on apply."""

import permafrost_engine_tpu.script.pf as pf

from scripts.common.constants import (
    EVENT_SETTINGS_APPLY,
    EVENT_VIDEO_SETTINGS_CHANGED,
)
from scripts.common.view_controllers.view_controller import ViewController


class VideoSettingsVC(ViewController):

    def __init__(self, view):
        self.view = view
        self._load_selection()
        self._og = self._snapshot()

    def _snapshot(self):
        v = self.view
        return (v.ar_idx, v.res_idx, v.mode_idx, v.vsync_on, v.shadows_on,
                v.water_reflect_on)

    def _load_selection(self):
        v = self.view
        res_saved = tuple(int(x) for x in
                          pf.settings_get("pf.video.resolution"))
        for i, cand in enumerate(v.res_opts):
            if cand == res_saved:
                v.res_idx = i
                break
        ar_saved = float(pf.settings_get("pf.video.aspect_ratio"))
        for i, (num, den) in enumerate(v.AR_OPTS):
            if abs(num / den - ar_saved) < 1e-3:
                v.ar_idx = i
                break
        v.mode_idx = int(pf.settings_get("pf.video.display_mode"))
        v.vsync_on = bool(pf.settings_get("pf.video.vsync"))
        v.shadows_on = bool(pf.settings_get("pf.video.shadows_enabled"))
        v.water_reflect_on = bool(
            pf.settings_get("pf.video.water_reflection"))

    def _on_changed(self, event):
        self.view.dirty = self._snapshot() != self._og

    def _on_apply(self, event):
        if event != "video" or not self.view.dirty:
            return
        v = self.view
        num, den = v.AR_OPTS[v.ar_idx]
        pf.settings_set("pf.video.aspect_ratio", num / den)
        pf.settings_set("pf.video.resolution", list(v.res_opts[v.res_idx]))
        pf.settings_set("pf.video.display_mode", v.mode_idx)
        pf.settings_set("pf.video.vsync", v.vsync_on)
        pf.settings_set("pf.video.shadows_enabled", v.shadows_on)
        pf.settings_set("pf.video.water_reflection", v.water_reflect_on)
        self._og = self._snapshot()
        self.view.dirty = False

    def activate(self):
        pf.register_ui_event_handler(EVENT_VIDEO_SETTINGS_CHANGED,
                                     self._on_changed)
        pf.register_ui_event_handler(EVENT_SETTINGS_APPLY, self._on_apply)

    def deactivate(self):
        pf.unregister_event_handler(EVENT_SETTINGS_APPLY, self._on_apply)
        pf.unregister_event_handler(EVENT_VIDEO_SETTINGS_CHANGED,
                                    self._on_changed)
