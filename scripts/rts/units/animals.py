"""Ambient wildlife (ref: scripts/rts/units/chicken.py, deer.py, doe.py):
non-combat animated movables — scenery that walks."""

from scripts.rts.units.anim_moveable import AnimMoveable


class Chicken(AnimMoveable):

    def __init__(self, pfobj_path, name, **kwargs):
        kwargs.setdefault("speed", 20.0)
        kwargs.setdefault("radius", 0.5)
        super().__init__(pfobj_path, name, **kwargs)

    def idle_anim(self):
        return "Idle"

    def move_anim(self):
        return "Walk"


class Deer(AnimMoveable):

    def __init__(self, pfobj_path, name, **kwargs):
        kwargs.setdefault("speed", 20.0)
        super().__init__(pfobj_path, name, **kwargs)

    def idle_anim(self):
        return "Idle"

    def move_anim(self):
        return "Run"


class Doe(AnimMoveable):

    def __init__(self, pfobj_path, name, **kwargs):
        kwargs.setdefault("speed", 20.0)
        super().__init__(pfobj_path, name, **kwargs)

    def idle_anim(self):
        return "Idle"

    def move_anim(self):
        return "Run"
