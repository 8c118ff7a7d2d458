"""Mutable game-scope state (ref: scripts/rts/globals.py): the scene
object list keeps strong references to spawned entities (entity wrappers
are weakref-tracked by the engine; whatever the game wants alive it must
hold)."""

scene_objs: list = []
scene_regions: list = []
