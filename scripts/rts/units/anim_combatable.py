"""AnimCombatable mixin (ref: scripts/rts/units/anim_combatable.py):
attack events trigger the unit's attack clip, death plays the death clip
once and then retires the entity from the scene; contributes the
Hold Position / Attack action-pad slots.

The reference returns to idle on EVENT_ATTACK_END; this engine reports
attack starts (per swing) and animation completion, so the attack clip
plays ONCE per swing and EVENT_ANIM_FINISHED restores idle — same visible
behavior (one attack animation per strike)."""

from abc import abstractmethod
import weakref

import permafrost_engine_tpu.script.pf as pf

import scripts.rts.action as action
import scripts.rts.globals as game_globals
from scripts.rts.units.controllable import Controllable


class AnimCombatable(pf.AnimEntity, pf.CombatableEntity, Controllable):

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.attacking = False
        self.register(pf.EVENT_ATTACK_START, AnimCombatable._on_attack,
                      weakref.ref(self))
        self.register(pf.EVENT_ENTITY_DEATH, AnimCombatable._on_death,
                      weakref.ref(self))

    @abstractmethod
    def idle_anim(self) -> str:
        """Clip to play when inert (shared with AnimMoveable)."""

    @abstractmethod
    def attack_anim(self) -> str:
        """Clip to play when striking."""

    @abstractmethod
    def death_anim(self) -> str:
        """Clip to play on death."""

    @staticmethod
    def _on_attack(ref, event):
        self = ref()
        if self is None:
            return
        self.play_anim(self.attack_anim(), mode=pf.ANIM_ONCE)
        if not self.attacking:      # a swing may land before the previous
            self.attacking = True   # clip finished; keep ONE finish handler
            self.register(pf.EVENT_ANIM_FINISHED,
                          AnimCombatable._on_attack_anim_finish, ref)

    @staticmethod
    def _on_attack_anim_finish(ref, event):
        self = ref()
        if self is None:
            return
        self.unregister(pf.EVENT_ANIM_FINISHED,
                        AnimCombatable._on_attack_anim_finish)
        if self.attacking:
            self.attacking = False
            self.play_anim(self.idle_anim())

    @staticmethod
    def _on_death(ref, event):
        self = ref()
        if self is None:
            return
        self.attacking = False
        self.play_anim(self.death_anim(), mode=pf.ANIM_ONCE)
        # keep a strong reference until the death animation completes
        self.register(pf.EVENT_ANIM_FINISHED,
                      AnimCombatable._on_death_anim_finish, self)

    @staticmethod
    def _on_death_anim_finish(self, event):
        self.unregister(pf.EVENT_ANIM_FINISHED,
                        AnimCombatable._on_death_anim_finish)
        if self in game_globals.scene_objs:
            game_globals.scene_objs.remove(self)

    def action(self, idx):
        if idx == 2:
            return action.ActionDesc(
                icon_normal="assets/icons/actions/hold_normal.png",
                icon_hover="assets/icons/actions/hold_hover.png",
                icon_active="assets/icons/actions/hold_active.png",
                action=AnimCombatable._hold_position_action,
                hotkey=pf.SDL_SCANCODE_H, label="Hold")
        if idx == 3:
            return action.ActionDesc(
                icon_normal="assets/icons/actions/attack_normal.png",
                icon_hover="assets/icons/actions/attack_hover.png",
                icon_active="assets/icons/actions/attack_active.png",
                action=AnimCombatable._attack_action,
                hotkey=pf.SDL_SCANCODE_A, label="Attack")
        return super().action(idx)

    @classmethod
    def _attack_action(cls):
        pf.set_attack_on_left_click()

    @classmethod
    def _hold_position_action(cls):
        for ent in pf.get_unit_selection():
            if isinstance(ent, pf.CombatableEntity):
                ent.hold_position()
