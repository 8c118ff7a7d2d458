"""Interactive map editor game script (ref: scripts/editor/__init__.py):
terrain painting, object placement, diplomacy setup and map/scene
save-load, all over the `pf` API and the shared scripts.common MVC
toolkit."""
