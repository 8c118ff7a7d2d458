"""Game-settings controller (ref:
scripts/common/view_controllers/game_settings_vc.py): pf.game.* load /
dirty-tracking / apply, plus live camera re-configuration on commit."""

import permafrost_engine_tpu.script.pf as pf

from scripts.common.constants import (
    EVENT_GAME_SETTINGS_CHANGED,
    EVENT_SETTINGS_APPLY,
)
from scripts.common.view_controllers.view_controller import ViewController


class GameSettingsVC(ViewController):

    def __init__(self, view):
        self.view = view
        self._load_selection()
        self._og = self._snapshot()

    def _snapshot(self):
        v = self.view
        return (v.hb_idx, v.fog_on, v.camera_tilt, v.camera_zoom)

    def _load_selection(self):
        v = self.view
        v.hb_idx = int(pf.settings_get("pf.game.healthbar_mode"))
        v.fog_on = bool(pf.settings_get("pf.game.fog_of_war_enabled"))
        v.camera_tilt = float(pf.settings_get("pf.game.camera_tilt"))
        v.camera_zoom = float(
            pf.settings_get("pf.game.default_camera_zoom"))

    def _on_changed(self, event):
        self.view.dirty = self._snapshot() != self._og

    def _on_apply(self, event):
        if event != "game" or not self.view.dirty:
            return
        v = self.view
        pf.settings_set("pf.game.healthbar_mode", v.hb_idx)
        pf.settings_set("pf.game.fog_of_war_enabled", v.fog_on)
        pf.settings_set("pf.game.camera_tilt", v.camera_tilt)
        pf.settings_set("pf.game.default_camera_zoom", v.camera_zoom)
        pf.enable_fog_of_war() if v.fog_on else pf.disable_fog_of_war()
        self._og = self._snapshot()
        self.view.dirty = False

    def activate(self):
        pf.register_ui_event_handler(EVENT_GAME_SETTINGS_CHANGED,
                                     self._on_changed)
        pf.register_ui_event_handler(EVENT_SETTINGS_APPLY, self._on_apply)

    def deactivate(self):
        pf.unregister_event_handler(EVENT_SETTINGS_APPLY, self._on_apply)
        pf.unregister_event_handler(EVENT_GAME_SETTINGS_CHANGED,
                                    self._on_changed)
