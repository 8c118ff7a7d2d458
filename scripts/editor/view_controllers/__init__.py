"""Editor controllers (ref: scripts/editor/view_controllers/__init__.py)."""
