"""Shared RTS-game constants (ref: scripts/rts/constants.py)."""

ACTION_NUM_ROWS = 3
ACTION_NUM_COLS = 4

# module-specific events (the reference reserves 0x20000+ for scripts)
EVENT_CONTROLLED_FACTION_CHANGED = 0x20000
EVENT_SETTINGS_SHOW = 0x20001
EVENT_PERF_SHOW = 0x20002
EVENT_SIMSTATE_CHANGE = 0x20003
EVENT_SESSION_SHOW = 0x20004
EVENT_UNIT_ACTION = 0x20005
