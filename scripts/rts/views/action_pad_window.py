"""Action pad (ref: scripts/rts/views/action_pad_window.py): a 3x4 grid
of unit actions anchored to the bottom-right, populated from the selected
controllable's descriptors; empty slots render disabled. While paused the
buttons render but fire nothing (the reference swaps in a no-op action)."""

import permafrost_engine_tpu.script.pf as pf

import scripts.common.button_style_ctx as btc
from scripts.rts.constants import (
    ACTION_NUM_COLS,
    ACTION_NUM_ROWS,
    EVENT_UNIT_ACTION,
)


class ActionPadWindow(pf.Window):

    BUTTON_WIDTH = 75
    BUTTON_PADDING = 6
    # ref: scripts/rts/views/action_pad_window.py DISABLED_* styling
    DISABLED_BG_COLOR = (40, 40, 40, 255)
    DISABLED_TEXT_COLOR = (60, 60, 60, 255)

    def __init__(self):
        w = (self.BUTTON_WIDTH * ACTION_NUM_COLS
             + (ACTION_NUM_COLS - 1) * self.BUTTON_PADDING
             + ACTION_NUM_COLS * 2 + 4)
        h = (self.BUTTON_WIDTH * ACTION_NUM_ROWS
             + (ACTION_NUM_ROWS - 1) * self.BUTTON_PADDING
             + ACTION_NUM_ROWS * 2 + 6)
        vw, vh = (1920, 1080)
        super().__init__(
            "ActionPad", (vw - w - 10, vh - h - 10, w, h),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_NO_SCROLLBAR,
            resize_mask=pf.ANCHOR_X_RIGHT | pf.ANCHOR_Y_BOT)
        self.clear_actions()

    def clear_actions(self):
        self.actions = [None] * (ACTION_NUM_ROWS * ACTION_NUM_COLS)

    def _disabled_button_label(self, label):
        """Empty slots render as greyed-out buttons via a scoped style
        override (ref: __disabled_button_label,
        scripts/rts/views/action_pad_window.py:62-71)."""
        button_style = {
            "normal": ActionPadWindow.DISABLED_BG_COLOR,
            "hover": ActionPadWindow.DISABLED_BG_COLOR,
            "active": ActionPadWindow.DISABLED_BG_COLOR,
            "text_normal": ActionPadWindow.DISABLED_TEXT_COLOR,
            "text_hover": ActionPadWindow.DISABLED_TEXT_COLOR,
            "text_active": ActionPadWindow.DISABLED_TEXT_COLOR,
        }
        with btc.ButtonStyle(**button_style):
            self.button_label(label)

    def update(self):
        running = pf.get_simstate() == pf.G_RUNNING
        for r in range(ACTION_NUM_ROWS):
            self.layout_row_static(self.BUTTON_WIDTH, self.BUTTON_WIDTH,
                                   ACTION_NUM_COLS)
            for c in range(ACTION_NUM_COLS):
                idx = r * ACTION_NUM_COLS + c
                act = self.actions[idx]
                if act is None:
                    self._disabled_button_label("")
                    continue
                self.image(act.icon_normal)
                if self.button_label(act.label) and running:
                    pf.global_event(EVENT_UNIT_ACTION, idx)
