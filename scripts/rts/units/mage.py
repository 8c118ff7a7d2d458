"""Mage (ref: scripts/rts/units/mage.py — 100 hp, 80 dmg, 0.10 armour,
ranged with 50u reach; the reference attaches a fireball projectile
descriptor, here the projectile system keys off is_ranged)."""

from scripts.rts.units.anim_combatable import AnimCombatable
from scripts.rts.units.anim_moveable import AnimMoveable


class Mage(AnimMoveable, AnimCombatable):

    def __init__(self, pfobj_path, name, **kwargs):
        kwargs.setdefault("hp", 100.0)
        kwargs.setdefault("base_dmg", 80.0)
        kwargs.setdefault("armour_pc", 0.10)
        kwargs.setdefault("attack_range", 50.0)
        kwargs.setdefault("is_ranged", True)
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
