"""Goblin (ref: scripts/rts/units/goblin.py — 120 hp, 40 dmg, 0.30
armour; cycles through three attack clips)."""

from scripts.rts.units.anim_combatable import AnimCombatable
from scripts.rts.units.anim_moveable import AnimMoveable


class Goblin(AnimMoveable, AnimCombatable):

    ATTACK_ANIMS = ["Attack.000", "Attack.001", "Attack.002"]

    def __init__(self, pfobj_path, name, **kwargs):
        self.attack_anim_idx = 0
        kwargs.setdefault("hp", 120.0)
        kwargs.setdefault("base_dmg", 40.0)
        kwargs.setdefault("armour_pc", 0.30)
        kwargs.setdefault("speed", 20.0)
        super().__init__(pfobj_path, name, **kwargs)

    def idle_anim(self):
        return "Idle"

    def move_anim(self):
        return "Walk"

    def attack_anim(self):
        ret = self.ATTACK_ANIMS[self.attack_anim_idx]
        self.attack_anim_idx = (self.attack_anim_idx + 1) \
            % len(self.ATTACK_ANIMS)
        return ret

    def death_anim(self):
        return "Die"
