"""Action-pad controller (ref:
scripts/rts/view_controllers/action_pad_vc.py): on selection change,
installs the first controllable selected unit's action descriptors into
the pad and maps their hotkeys; key presses and pad-button events invoke
the bound action. Uses gameplay-scoped (not UI-scoped) handlers so the
pad freezes while paused."""

import weakref

import permafrost_engine_tpu.script.pf as pf

from scripts.common.view_controllers.view_controller import ViewController
from scripts.rts.constants import (
    ACTION_NUM_COLS,
    ACTION_NUM_ROWS,
    EVENT_UNIT_ACTION,
)
from scripts.rts.units.controllable import Controllable


class ActionPadVC(ViewController):

    def __init__(self, view):
        self.view = view
        self._hotkey_action_map: dict[int, object] = {}
        self._active_controllable = None

    def _install_hotkeys(self, controllable):
        for i in range(ACTION_NUM_ROWS * ACTION_NUM_COLS):
            act = controllable.action(i)
            if act and act.hotkey:
                self._hotkey_action_map[act.hotkey] = act.action

    def _uninstall_hotkeys(self, controllable):
        for i in range(ACTION_NUM_ROWS * ACTION_NUM_COLS):
            act = controllable.action(i)
            if act and act.hotkey:
                self._hotkey_action_map.pop(act.hotkey, None)

    def _on_selection_changed(self, event):
        self.view.clear_actions()
        if self._active_controllable and self._active_controllable():
            self._uninstall_hotkeys(self._active_controllable())
        self._active_controllable = None

        sel = [e for e in pf.get_unit_selection()
               if isinstance(e, Controllable)]
        if not sel:
            return
        first = sel[0]
        fac_list = pf.get_factions_list()
        if not fac_list[first.faction_id]["controllable"]:
            return
        self._active_controllable = weakref.ref(first)
        self._install_hotkeys(first)
        self.view.actions = [
            first.action(i)
            for i in range(ACTION_NUM_ROWS * ACTION_NUM_COLS)]

    def _on_keydown(self, event):
        scancode = event[0]
        if scancode in self._hotkey_action_map \
                and not pf.ui_text_edit_has_focus():
            self._hotkey_action_map[scancode]()

    def _on_unit_action(self, event):
        act = self.view.actions[event] if 0 <= event < len(
            self.view.actions) else None
        if act is not None:
            act.action()

    def activate(self):
        # gameplay-scoped registrations: frozen while paused
        pf.register_event_handler(pf.EVENT_SELECTION_CHANGED,
                                  self._on_selection_changed)
        pf.register_event_handler(pf.SDL_KEYDOWN, self._on_keydown)
        pf.register_event_handler(EVENT_UNIT_ACTION, self._on_unit_action)
        self.view.show()

    def deactivate(self):
        self.view.hide()
        pf.unregister_event_handler(EVENT_UNIT_ACTION, self._on_unit_action)
        pf.unregister_event_handler(pf.SDL_KEYDOWN, self._on_keydown)
        pf.unregister_event_handler(pf.EVENT_SELECTION_CHANGED,
                                    self._on_selection_changed)
