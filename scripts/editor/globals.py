"""Editor-scope mutable state (ref: scripts/editor/globals.py). The map
model IS the engine's MapData (assets/pfmap.py) — the editor mutates it
in place and re-bakes through pf.update_tiles / engine reload, where the
reference keeps a parallel script-side Map mirror."""

active_map = None          # assets.pfmap.MapData
active_objects_list = []
map_filename = None
scene_filename = None
