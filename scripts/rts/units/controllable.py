"""Controllable mixin (ref: scripts/rts/units/controllable.py): entities
customize their action-pad slots by overriding action(idx); construction
validates that no two slots claim the same hotkey."""

from abc import ABC

import permafrost_engine_tpu.script.pf as pf

from scripts.rts.constants import ACTION_NUM_COLS, ACTION_NUM_ROWS


class Controllable(pf.Entity, ABC):

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        taken = {}
        for i in range(ACTION_NUM_ROWS * ACTION_NUM_COLS):
            act = self.action(i)
            if act is None or act.hotkey is None:
                continue
            if act.hotkey in taken:
                raise RuntimeError(
                    f"Conflict in hotkeys for instance of "
                    f"{type(self).__name__}: slots {taken[act.hotkey]} "
                    f"and {i}")
            taken[act.hotkey] = i

    def action(self, idx):
        """Return the ActionDesc for pad slot `idx`, or None."""
        if not (0 <= idx < ACTION_NUM_ROWS * ACTION_NUM_COLS):
            raise IndexError(idx)
        return None
