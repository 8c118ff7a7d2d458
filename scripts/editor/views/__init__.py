"""Editor views (ref: scripts/editor/views/__init__.py)."""
