"""Sinbad (ref: scripts/rts/units/sinbad.py — 250 hp, 80 dmg, 0.5
armour; toggleable idle dance and alternating slice attacks, with a
custom action-pad slot bound to V)."""

import permafrost_engine_tpu.script.pf as pf

import scripts.rts.action as action
from scripts.rts.units.anim_combatable import AnimCombatable
from scripts.rts.units.anim_moveable import AnimMoveable


class Sinbad(AnimMoveable, AnimCombatable):

    IDLE_MAP = ["Dance", "JumpLoop"]
    ATTACK_MAP = ["SliceHorizontal", "SliceVertical"]

    def __init__(self, pfobj_path, name, **kwargs):
        self.idle_idx = 0
        self.attack_idx = 0
        kwargs.setdefault("hp", 250.0)
        kwargs.setdefault("base_dmg", 80.0)
        kwargs.setdefault("armour_pc", 0.5)
        kwargs.setdefault("speed", 20.0)
        super().__init__(pfobj_path, name, **kwargs)

    def anim_toggle(self):
        self.idle_idx = (self.idle_idx + 1) % len(self.IDLE_MAP)
        if not self.moving:
            self.play_anim(self.IDLE_MAP[self.idle_idx])

    def idle_anim(self):
        return self.IDLE_MAP[self.idle_idx]

    def move_anim(self):
        return "RunBase"

    def attack_anim(self):
        ret = self.ATTACK_MAP[self.attack_idx]
        self.attack_idx = (self.attack_idx + 1) % len(self.ATTACK_MAP)
        return ret

    def death_anim(self):
        return "JumpStart"

    def action(self, idx):
        if idx == 8:
            return action.ActionDesc(
                icon_normal="assets/icons/actions/dance_normal.png",
                icon_hover="assets/icons/actions/dance_hover.png",
                icon_active="assets/icons/actions/dance_active.png",
                action=Sinbad._toggle_idle_action,
                hotkey=pf.SDL_SCANCODE_V, label="Dance")
        return super().action(idx)

    @classmethod
    def _toggle_idle_action(cls):
        for ent in pf.get_unit_selection():
            if isinstance(ent, Sinbad):
                ent.anim_toggle()
