"""Top tab strip hosting the editor tool panes (ref:
scripts/editor/views/tab_bar_window.py). Children render into the left
pane below the strip."""

import permafrost_engine_tpu.script.pf as pf

from scripts.editor.constants import (
    EVENT_TOP_TAB_SELECTION_CHANGED,
    UI_LEFT_PANE_WIDTH,
    UI_TAB_BAR_HEIGHT,
)


class TabBarWindow(pf.Window):

    def __init__(self):
        super().__init__(
            "TabBar", (120, 0, 1920 - 120, UI_TAB_BAR_HEIGHT),
            pf.NK_WINDOW_NO_SCROLLBAR)
        self.labels: list[str] = []
        self.children: list[pf.Window] = []
        self.active_idx = 0

    def push_child(self, label: str, child: pf.Window) -> None:
        self.labels.append(label)
        self.children.append(child)
        child.rect = [0, UI_TAB_BAR_HEIGHT, UI_LEFT_PANE_WIDTH,
                      1080 - UI_TAB_BAR_HEIGHT]

    def update(self):
        self.layout_row_static(UI_TAB_BAR_HEIGHT - 10, 120,
                               max(len(self.labels), 1))
        for i, label in enumerate(self.labels):
            if self.selectable_label(label, pf.NK_TEXT_ALIGN_CENTERED,
                                     i == self.active_idx):
                if i != self.active_idx:
                    self.active_idx = i
                    pf.global_event(EVENT_TOP_TAB_SELECTION_CHANGED, i)
