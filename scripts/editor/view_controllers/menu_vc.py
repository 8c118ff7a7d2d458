"""Menu controller (ref: scripts/editor/view_controllers/menu_vc.py):
New (fresh flat map), Load/Save/Save As via the file chooser (pfmap text
round-trip of the active MapData), Settings/Performance/Session dialogs,
Exit (SDL_QUIT)."""

import permafrost_engine_tpu.script.pf as pf

import scripts.common.constants as cc
import scripts.editor.globals as eg
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
from scripts.editor.constants import (
    EVENT_FILE_CHOOSER_CANCEL,
    EVENT_FILE_CHOOSER_OK,
    EVENT_MENU_CANCEL,
    EVENT_MENU_EXIT,
    EVENT_MENU_LOAD,
    EVENT_MENU_NEW,
    EVENT_MENU_PERF_SHOW,
    EVENT_MENU_SAVE,
    EVENT_MENU_SAVE_AS,
    EVENT_MENU_SESSION_SHOW,
    EVENT_MENU_SETTINGS_SHOW,
)
from scripts.editor.views.file_chooser_window import FileChooserWindow


class MenuVC(ViewController):

    def __init__(self, view):
        self.view = view
        self.chooser = FileChooserWindow()
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

    # -- map persistence -----------------------------------------------------

    def _save_map(self, path: str) -> None:
        from permafrost_engine_tpu.assets.pfmap import write_pfmap
        with open(path, "w") as f:
            f.write(write_pfmap(eg.active_map))
        eg.map_filename = path

    def _load_map(self, path: str) -> None:
        from permafrost_engine_tpu.assets.pfmap import parse_pfmap
        with open(path) as f:
            eg.active_map = parse_pfmap(f.read())
        pf.context().engine.load_map_data(eg.active_map)
        eg.map_filename = path

    # -- handlers -------------------------------------------------------------

    def _on_new(self, event):
        from permafrost_engine_tpu.assets.pfmap import make_flat_map
        cfg = pf.context().engine.cfg
        eg.active_map = make_flat_map(cfg.chunks_r, cfg.chunks_c)
        pf.context().engine.load_map_data(eg.active_map)
        eg.map_filename = None
        self.view.hide()

    def _on_load(self, event):
        self.chooser.open_for("load", eg.map_filename or "")
        self.view.hide()

    def _on_save(self, event):
        if eg.map_filename:
            self._save_map(eg.map_filename)
            self.view.hide()
        else:
            self._on_save_as(event)

    def _on_save_as(self, event):
        self.chooser.open_for("save", eg.map_filename or "")
        self.view.hide()

    def _on_chooser_ok(self, event):
        self.chooser.hide()
        if event["purpose"] == "save":
            self._save_map(event["path"])
        else:
            self._load_map(event["path"])

    def _on_chooser_cancel(self, event):
        self.chooser.hide()

    def _on_settings_show(self, event):
        self.view.hide()
        if not self._settings_shown:
            self.settings_vc.activate()
            self._settings_shown = True

    def _on_settings_hide(self, event):
        if self._settings_shown:
            self.settings_vc.deactivate()
            self._settings_shown = False

    def _on_perf_show(self, event):
        self.view.hide()
        if self.perf_view.hidden:
            self.perf_view.show()

    def _on_session_show(self, event):
        self.view.hide()
        if self.session_view.hidden:
            self.session_view.show()

    def _on_session_save(self, event):
        self.session_view.hide()
        pf.save_session(event)

    def _on_session_load(self, event):
        self.session_view.hide()
        pf.load_session(event)

    def _on_cancel(self, event):
        self.view.hide()

    def _on_exit(self, event):
        pf.global_event(pf.SDL_QUIT, None)
        self.view.hide()

    _WIRING = [
        (EVENT_MENU_NEW, "_on_new"),
        (EVENT_MENU_LOAD, "_on_load"),
        (EVENT_MENU_SAVE, "_on_save"),
        (EVENT_MENU_SAVE_AS, "_on_save_as"),
        (EVENT_FILE_CHOOSER_OK, "_on_chooser_ok"),
        (EVENT_FILE_CHOOSER_CANCEL, "_on_chooser_cancel"),
        (EVENT_MENU_SETTINGS_SHOW, "_on_settings_show"),
        (cc.EVENT_SETTINGS_HIDE, "_on_settings_hide"),
        (EVENT_MENU_PERF_SHOW, "_on_perf_show"),
        (EVENT_MENU_SESSION_SHOW, "_on_session_show"),
        (cc.EVENT_SESSION_SAVE_REQUESTED, "_on_session_save"),
        (cc.EVENT_SESSION_LOAD_REQUESTED, "_on_session_load"),
        (EVENT_MENU_CANCEL, "_on_cancel"),
        (EVENT_MENU_EXIT, "_on_exit"),
    ]

    def activate(self):
        for event, name in self._WIRING:
            pf.register_ui_event_handler(event, getattr(self, name))

    def deactivate(self):
        self.view.hide()
        for event, name in reversed(self._WIRING):
            pf.unregister_event_handler(event, getattr(self, name))
