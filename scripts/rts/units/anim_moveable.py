"""AnimMoveable mixin (ref: scripts/rts/units/anim_moveable.py): plays the
unit's walk clip while the engine reports it moving and its idle clip when
it stops, and contributes the Move/Stop action-pad slots."""

from abc import abstractmethod
import weakref

import permafrost_engine_tpu.script.pf as pf

import scripts.rts.action as action
from scripts.rts.units.controllable import Controllable


class AnimMoveable(pf.AnimEntity, pf.MovableEntity, Controllable):

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.anim_moving = False
        self.register(pf.EVENT_MOTION_START, AnimMoveable._on_motion_begin,
                      weakref.ref(self))
        self.register(pf.EVENT_MOTION_END, AnimMoveable._on_motion_end,
                      weakref.ref(self))
        self.play_anim(self.idle_anim())

    @abstractmethod
    def idle_anim(self) -> str:
        """Clip to play when stationary."""

    @abstractmethod
    def move_anim(self) -> str:
        """Clip to play while moving."""

    @staticmethod
    def _on_motion_begin(ref, event):
        self = ref()
        if self is None or self.anim_moving:
            return
        self.anim_moving = True
        self.play_anim(self.move_anim())

    @staticmethod
    def _on_motion_end(ref, event):
        self = ref()
        if self is None or not self.anim_moving:
            return
        self.anim_moving = False
        self.play_anim(self.idle_anim())

    def action(self, idx):
        if idx == 0:
            return action.ActionDesc(
                icon_normal="assets/icons/actions/move_normal.png",
                icon_hover="assets/icons/actions/move_hover.png",
                icon_active="assets/icons/actions/move_active.png",
                action=AnimMoveable._move_action,
                hotkey=pf.SDL_SCANCODE_M, label="Move")
        if idx == 1 and super().action(1) is None:
            return action.ActionDesc(
                icon_normal="assets/icons/actions/stop_normal.png",
                icon_hover="assets/icons/actions/stop_hover.png",
                icon_active="assets/icons/actions/stop_active.png",
                action=AnimMoveable._stop_action,
                hotkey=pf.SDL_SCANCODE_S, label="Stop")
        return super().action(idx)

    @classmethod
    def _move_action(cls):
        pf.set_move_on_left_click()

    @classmethod
    def _stop_action(cls):
        for ent in pf.get_unit_selection():
            if isinstance(ent, pf.MovableEntity):
                ent.stop()
