"""RTS game views (ref: scripts/rts/views/__init__.py)."""
