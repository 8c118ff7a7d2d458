"""Main demo control panel (ref: scripts/rts/views/demo_window.py):
controlled-faction selector plus Settings / Performance / Pause /
Session / Console / Exit buttons, each firing an event consumed by
DemoVC."""

import permafrost_engine_tpu.script.pf as pf

from scripts.rts.constants import (
    EVENT_CONTROLLED_FACTION_CHANGED,
    EVENT_PERF_SHOW,
    EVENT_SESSION_SHOW,
    EVENT_SETTINGS_SHOW,
    EVENT_SIMSTATE_CHANGE,
)


class DemoWindow(pf.Window):

    WIDTH = 250
    HEIGHT = 430

    def __init__(self):
        super().__init__(
            "Permafrost Engine Demo",
            (25, 25, self.WIDTH, self.HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_MOVABLE
            | pf.NK_WINDOW_MINIMIZABLE | pf.NK_WINDOW_TITLE
            | pf.NK_WINDOW_NO_SCROLLBAR)
        self.fac_names: list[str] = []
        self.active_fac_idx = 0

    def update(self):
        self.layout_row_dynamic(20, 1)
        self.label_colored("Controlled Faction:", 255, 255, 255)

        self.layout_row_dynamic(25, 1)
        for i, name in enumerate(self.fac_names):
            on = self.selectable_label(name, pf.NK_TEXT_ALIGN_LEFT,
                                       i == self.active_fac_idx)
            if on and i != self.active_fac_idx:
                self.active_fac_idx = i
                pf.global_event(EVENT_CONTROLLED_FACTION_CHANGED, i)

        self.layout_row_dynamic(6, 1)
        self.spacer()

        self.layout_row_dynamic(30, 1)
        if self.button_label("Settings"):
            pf.global_event(EVENT_SETTINGS_SHOW, None)

        self.layout_row_dynamic(30, 1)
        if self.button_label("Performance"):
            pf.global_event(EVENT_PERF_SHOW, None)

        paused = pf.get_simstate() != pf.G_RUNNING
        self.layout_row_dynamic(30, 1)
        if self.button_label("Resume" if paused else "Pause"):
            pf.global_event(
                EVENT_SIMSTATE_CHANGE,
                pf.G_RUNNING if paused else pf.G_PAUSED_UI_RUNNING)

        self.layout_row_dynamic(30, 1)
        if self.button_label("Session"):
            pf.global_event(EVENT_SESSION_SHOW, None)

        self.layout_row_dynamic(30, 1)
        if self.button_label("Console"):
            pf.show_console()

        self.layout_row_dynamic(30, 1)
        if self.button_label("Exit Demo"):
            pf.global_event(pf.SDL_QUIT, None)
