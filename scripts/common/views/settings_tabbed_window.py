"""Settings dialog shell: a tab strip over child settings windows
(ref: scripts/common/views/settings_tabbed_window.py). Children are
pushed by the TabBarVC; the active child's update() renders inline under
the tab row."""

import permafrost_engine_tpu.script.pf as pf

from scripts.common.constants import (
    EVENT_SETTINGS_HIDE,
    EVENT_SETTINGS_TAB_SEL_CHANGED,
)


class SettingsTabbedWindow(pf.Window):

    WIDTH = 540
    HEIGHT = 440

    def __init__(self):
        vw, vh = (1920, 1080)
        super().__init__(
            "Settings",
            ((vw - self.WIDTH) / 2, (vh - self.HEIGHT) / 2,
             self.WIDTH, self.HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_TITLE
            | pf.NK_WINDOW_NO_SCROLLBAR,
            resize_mask=pf.ANCHOR_X_CENTER | pf.ANCHOR_Y_CENTER)
        self.labels: list[str] = []
        self.children: list[pf.Window] = []
        self.active_idx = 0

    def push_child(self, label: str, child: pf.Window) -> None:
        self.labels.append(label)
        self.children.append(child)

    def update(self):
        self.layout_row_dynamic(30, max(len(self.labels), 1))
        for i, label in enumerate(self.labels):
            if self.selectable_label(label, pf.NK_TEXT_ALIGN_CENTERED,
                                     i == self.active_idx):
                if i != self.active_idx:
                    self.active_idx = i
                    pf.global_event(EVENT_SETTINGS_TAB_SEL_CHANGED, i)
        # render the active child's widgets into this window's draw list
        if self.children:
            child = self.children[self.active_idx]
            child.draw_list = self.draw_list
            child._widget_state = self._widget_state
            child._slider_ix = getattr(self, "_slider_ix", 0)
            child.update()
            self._slider_ix = getattr(child, "_slider_ix", 0)
        self.layout_row_dynamic(30, 1)
        if self.button_label("Close"):
            pf.global_event(EVENT_SETTINGS_HIDE, None)
