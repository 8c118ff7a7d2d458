"""RTS game controllers (ref: scripts/rts/view_controllers/__init__.py)."""
