"""Editor menu (ref: scripts/editor/views/menu_window.py): a modal menu
with New/Load/Save/Save As/Settings/Performance/Session/Exit, opened from
a persistent Menu button in the top-left corner."""

import permafrost_engine_tpu.script.pf as pf

from scripts.editor.constants import (
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


class Menu(pf.Window):

    WIDTH = 300
    HEIGHT = 400

    def __init__(self):
        vw, vh = (1920, 1080)
        super().__init__(
            "Menu",
            ((vw - self.WIDTH) / 2, (vh - self.HEIGHT) / 2,
             self.WIDTH, self.HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_TITLE
            | pf.NK_WINDOW_NO_SCROLLBAR,
            resize_mask=pf.ANCHOR_X_CENTER | pf.ANCHOR_Y_CENTER)

    def update(self):
        items = [("New", EVENT_MENU_NEW), ("Load Map", EVENT_MENU_LOAD),
                 ("Save Map", EVENT_MENU_SAVE),
                 ("Save Map As", EVENT_MENU_SAVE_AS),
                 ("Settings", EVENT_MENU_SETTINGS_SHOW),
                 ("Performance", EVENT_MENU_PERF_SHOW),
                 ("Session", EVENT_MENU_SESSION_SHOW),
                 ("Cancel", EVENT_MENU_CANCEL),
                 ("Exit", EVENT_MENU_EXIT)]
        for label, event in items:
            self.layout_row_dynamic(30, 1)
            if self.button_label(label):
                pf.global_event(event, None)


class MenuButtonWindow(pf.Window):
    """The always-visible 'Menu' button (top-left, above the tab bar)."""

    def __init__(self, menu: Menu):
        super().__init__("MenuButton", (0, 0, 120, 40),
                         pf.NK_WINDOW_NO_SCROLLBAR)
        self.menu = menu

    def update(self):
        self.layout_row_dynamic(30, 1)
        if self.button_label("Menu"):
            self.menu.show()
