"""Objects tool pane (ref: scripts/editor/views/objects_tab_window.py):
place/select mode toggle, the placeable-class browser, spawn faction
selector, and Delete Selected."""

import permafrost_engine_tpu.script.pf as pf

from scripts.editor.constants import (
    EVENT_OBJECT_DELETE_SELECTION,
    EVENT_OBJECT_SELECTION_CHANGED,
    EVENT_OBJECTS_TAB_MODE_CHANGED,
    UI_LEFT_PANE_WIDTH,
    UI_TAB_BAR_HEIGHT,
)

OBJECTS_MODE_PLACE = 0
OBJECTS_MODE_SELECT = 1


class ObjectsTabWindow(pf.Window):

    def __init__(self):
        super().__init__(
            "ObjectsTab",
            (0, UI_TAB_BAR_HEIGHT, UI_LEFT_PANE_WIDTH,
             1080 - UI_TAB_BAR_HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_NO_SCROLLBAR)
        self.mode = OBJECTS_MODE_PLACE
        self.class_names: list[str] = []
        self.class_idx = 0
        self.faction_idx = 0

    def update(self):
        self.layout_row_dynamic(24, 2)
        for i, mode in enumerate(["Place", "Select"]):
            on = self.option_label(mode, i == self.mode)
            if on and i != self.mode:
                self.mode = i
                pf.global_event(EVENT_OBJECTS_TAB_MODE_CHANGED, i)

        self.layout_row_dynamic(20, 1)
        self.label("Object:")
        self.layout_row_dynamic(24, 1)
        for i, name in enumerate(self.class_names):
            on = self.selectable_label(name, pf.NK_TEXT_ALIGN_LEFT,
                                       i == self.class_idx)
            if on and i != self.class_idx:
                self.class_idx = i
                pf.global_event(EVENT_OBJECT_SELECTION_CHANGED, i)

        self.layout_row_dynamic(20, 1)
        self.label("Faction:")
        self.layout_row_dynamic(24, 1)
        facs = pf.get_factions_list()
        for i, fac in enumerate(facs):
            on = self.selectable_label(fac["name"], pf.NK_TEXT_ALIGN_LEFT,
                                       i == self.faction_idx)
            if on:
                self.faction_idx = i

        self.layout_row_dynamic(30, 1)
        if self.button_label("Delete Selected"):
            pf.global_event(EVENT_OBJECT_DELETE_SELECTION, None)
