"""Terrain tool pane (ref: scripts/editor/views/terrain_tab_window.py):
brush size, brush mode (height / material / pathability), target height
selector and the material palette from the active map."""

import permafrost_engine_tpu.script.pf as pf

from scripts.editor.constants import (
    EVENT_HEIGHT_SELECTION_CHANGED,
    EVENT_TERRAIN_BRUSH_SIZE_CHANGED,
    EVENT_TERRAIN_BRUSH_TYPE_CHANGED,
    EVENT_TEXTURE_SELECTION_CHANGED,
    UI_LEFT_PANE_WIDTH,
    UI_TAB_BAR_HEIGHT,
)

BRUSH_SIZES = [1, 3, 5]
BRUSH_MODES = ["Height", "Material", "Blockers"]


class TerrainTabWindow(pf.Window):

    def __init__(self):
        super().__init__(
            "TerrainTab",
            (0, UI_TAB_BAR_HEIGHT, UI_LEFT_PANE_WIDTH,
             1080 - UI_TAB_BAR_HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_NO_SCROLLBAR)
        self.brush_size_idx = 0
        self.brush_mode_idx = 0
        self.height = 2
        self.pathable = True
        self.mat_names: list[str] = []
        self.mat_idx = 0

    def update(self):
        self.layout_row_dynamic(20, 1)
        self.label("Brush Size:")
        self.layout_row_dynamic(24, len(BRUSH_SIZES))
        for i, sz in enumerate(BRUSH_SIZES):
            on = self.option_label(f"{sz}x{sz}", i == self.brush_size_idx)
            if on and i != self.brush_size_idx:
                self.brush_size_idx = i
                pf.global_event(EVENT_TERRAIN_BRUSH_SIZE_CHANGED, i)

        self.layout_row_dynamic(20, 1)
        self.label("Brush Mode:")
        self.layout_row_dynamic(24, len(BRUSH_MODES))
        for i, mode in enumerate(BRUSH_MODES):
            on = self.option_label(mode, i == self.brush_mode_idx)
            if on and i != self.brush_mode_idx:
                self.brush_mode_idx = i
                pf.global_event(EVENT_TERRAIN_BRUSH_TYPE_CHANGED, i)

        self.layout_row_dynamic(20, 1)
        self.label(f"Height: {self.height}")
        self.layout_row_dynamic(24, 1)
        h = self.slider_float(-4.0, float(self.height), 9.0, 1.0)
        if int(h) != self.height:
            self.height = int(h)
            pf.global_event(EVENT_HEIGHT_SELECTION_CHANGED, self.height)

        self.layout_row_dynamic(24, 1)
        self.pathable = self.checkbox("Pathable", self.pathable)

        self.layout_row_dynamic(20, 1)
        self.label("Material:")
        self.layout_row_dynamic(24, 1)
        for i, name in enumerate(self.mat_names):
            on = self.selectable_label(name, pf.NK_TEXT_ALIGN_LEFT,
                                       i == self.mat_idx)
            if on and i != self.mat_idx:
                self.mat_idx = i
                pf.global_event(EVENT_TEXTURE_SELECTION_CHANGED, i)
