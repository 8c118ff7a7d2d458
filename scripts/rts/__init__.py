"""Demo RTS game (ref: scripts/rts/__init__.py): unit roster, action-pad
UI, and the sandbox scenario in main.py — a full game written purely
against the `pf` API."""
