"""Shared game-script UI toolkit (ref: scripts/common/__init__.py)."""
