"""Session save/load dialog (ref:
scripts/common/views/session_window.py): a file-path text edit plus Save
and Load buttons that fire the session-requested events the owning VC
consumes."""

import os

import permafrost_engine_tpu.script.pf as pf

from scripts.common.constants import (
    EVENT_SESSION_LOAD_REQUESTED,
    EVENT_SESSION_SAVE_REQUESTED,
)


class SessionWindow(pf.Window):

    WIDTH = 500
    HEIGHT = 140

    def __init__(self):
        vw, vh = (1920, 1080)
        super().__init__(
            "Session",
            ((vw - self.WIDTH) / 2, (vh - self.HEIGHT) / 2,
             self.WIDTH, self.HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_NO_SCROLLBAR
            | pf.NK_WINDOW_TITLE | pf.NK_WINDOW_CLOSABLE,
            resize_mask=pf.ANCHOR_X_CENTER | pf.ANCHOR_Y_CENTER)
        self.default_path = os.path.join(pf.context().basedir, "session.bin")

    @property
    def hidden(self) -> bool:
        return not self.shown

    @property
    def filestring(self) -> str:
        return self._widget_state.get(("text", "session_path"),
                                      self.default_path)

    def update(self):
        self.layout_row_dynamic(20, 1)
        self.label_colored("Session File:", 175, 175, 175)
        self.layout_row_dynamic(30, 1)
        path = self.text_edit("session_path", self.default_path)

        self.layout_row_dynamic(30, 2)
        if self.button_label("Save"):
            pf.global_event(EVENT_SESSION_SAVE_REQUESTED, path)
        if self.button_label("Load"):
            pf.global_event(EVENT_SESSION_LOAD_REQUESTED, path)
