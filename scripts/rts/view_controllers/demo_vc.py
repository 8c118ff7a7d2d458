"""Main demo controller (ref:
scripts/rts/view_controllers/demo_vc.py): owns the settings tab stack,
the performance HUD and the session dialog, switches the controlled
faction, and performs pause/resume + save/load on view events."""

import permafrost_engine_tpu.script.pf as pf

import scripts.common.constants as cc
from scripts.common.view_controllers.game_settings_vc import GameSettingsVC
from scripts.common.view_controllers.tab_bar_vc import TabBarVC
from scripts.common.view_controllers.video_settings_vc import (
    VideoSettingsVC,
)
from scripts.common.view_controllers.view_controller import ViewController
from scripts.common.views.game_settings_window import GameSettingsWindow
from scripts.common.views.perf_stats_window import PerfStatsWindow
from scripts.common.views.session_window import SessionWindow
from scripts.common.views.settings_tabbed_window import SettingsTabbedWindow
from scripts.common.views.video_settings_window import VideoSettingsWindow
from scripts.rts.constants import (
    EVENT_CONTROLLED_FACTION_CHANGED,
    EVENT_PERF_SHOW,
    EVENT_SESSION_SHOW,
    EVENT_SETTINGS_SHOW,
    EVENT_SIMSTATE_CHANGE,
)


class DemoVC(ViewController):

    def __init__(self, view):
        self.view = view
        self.perf_view = PerfStatsWindow()
        self.session_view = SessionWindow()
        self.settings_vc = TabBarVC(
            SettingsTabbedWindow(),
            tab_change_event=cc.EVENT_SETTINGS_TAB_SEL_CHANGED)
        self.settings_vc.push_child(
            "Video", VideoSettingsVC(VideoSettingsWindow()))
        self.settings_vc.push_child(
            "Game", GameSettingsVC(GameSettingsWindow()))
        self._settings_shown = False

        self.view.fac_names = [f["name"] for f in pf.get_factions_list()]
        assert self.view.fac_names, "the game must create factions first"
        self.view.active_fac_idx = min(1, len(self.view.fac_names) - 1)

    # -- handlers ------------------------------------------------------------

    def _on_controlled_faction_changed(self, event):
        pf.clear_unit_selection()
        for i in range(len(pf.get_factions_list())):
            pf.set_faction_controllable(i, False)
        pf.set_faction_controllable(event, True)

    def _on_settings_show(self, event):
        if not self._settings_shown:
            self.settings_vc.activate()
            self._settings_shown = True

    def _on_settings_hide(self, event):
        if self._settings_shown:
            self.settings_vc.deactivate()
            self._settings_shown = False

    def _on_perf_show(self, event):
        if self.perf_view.hidden:
            self.perf_view.show()

    def _on_ss_change(self, event):
        pf.set_simstate(event)

    def _on_session_show(self, event):
        if self.session_view.hidden:
            self.session_view.show()

    def _on_session_save(self, event):
        # the reference pauses around the save because its sim thread
        # races the serializer (demo_vc.py __on_session_save); this
        # engine's host save is single-threaded and atomic, and pausing
        # here would bake PAUSED into the blob so loads resume paused
        self.session_view.hide()
        pf.save_session(event)

    def _on_session_load(self, event):
        self.session_view.hide()
        pf.load_session(event)

    # -- lifecycle -------------------------------------------------------------

    def activate(self):
        pf.register_ui_event_handler(EVENT_CONTROLLED_FACTION_CHANGED,
                                     self._on_controlled_faction_changed)
        pf.register_ui_event_handler(EVENT_SETTINGS_SHOW,
                                     self._on_settings_show)
        pf.register_ui_event_handler(cc.EVENT_SETTINGS_HIDE,
                                     self._on_settings_hide)
        pf.register_ui_event_handler(EVENT_PERF_SHOW, self._on_perf_show)
        pf.register_ui_event_handler(EVENT_SIMSTATE_CHANGE,
                                     self._on_ss_change)
        pf.register_ui_event_handler(EVENT_SESSION_SHOW,
                                     self._on_session_show)
        pf.register_ui_event_handler(cc.EVENT_SESSION_SAVE_REQUESTED,
                                     self._on_session_save)
        pf.register_ui_event_handler(cc.EVENT_SESSION_LOAD_REQUESTED,
                                     self._on_session_load)
        self.view.show()

    def deactivate(self):
        self.view.hide()
        pf.unregister_event_handler(cc.EVENT_SESSION_LOAD_REQUESTED,
                                    self._on_session_load)
        pf.unregister_event_handler(cc.EVENT_SESSION_SAVE_REQUESTED,
                                    self._on_session_save)
        pf.unregister_event_handler(EVENT_SESSION_SHOW,
                                    self._on_session_show)
        pf.unregister_event_handler(EVENT_SIMSTATE_CHANGE,
                                    self._on_ss_change)
        pf.unregister_event_handler(EVENT_PERF_SHOW, self._on_perf_show)
        pf.unregister_event_handler(cc.EVENT_SETTINGS_HIDE,
                                    self._on_settings_hide)
        pf.unregister_event_handler(EVENT_SETTINGS_SHOW,
                                    self._on_settings_show)
        pf.unregister_event_handler(EVENT_CONTROLLED_FACTION_CHANGED,
                                    self._on_controlled_faction_changed)
