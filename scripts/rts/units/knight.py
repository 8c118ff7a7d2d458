"""Knight (ref: scripts/rts/units/knight.py — 150 hp, 50 dmg,
0.5 armour, speed 20)."""

from scripts.rts.units.anim_combatable import AnimCombatable
from scripts.rts.units.anim_moveable import AnimMoveable


class Knight(AnimMoveable, AnimCombatable):

    def __init__(self, pfobj_path, name, **kwargs):
        kwargs.setdefault("hp", 150.0)
        kwargs.setdefault("base_dmg", 50.0)
        kwargs.setdefault("armour_pc", 0.5)
        kwargs.setdefault("speed", 20.0)
        super().__init__(pfobj_path, name, **kwargs)

    def idle_anim(self):
        return "Idle"

    def move_anim(self):
        return "Walk"

    def attack_anim(self):
        return "Attack"

    def death_anim(self):
        return "Die"
