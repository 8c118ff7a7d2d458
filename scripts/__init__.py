"""Game-logic script packages (SURVEY layer 8).

The analogue of the reference's `scripts/` tree (ref: scripts/rts,
scripts/common): pure-Python game code written against the `pf` API,
with no knowledge of the engine internals. `scripts.common` holds the
shared MVC UI toolkit; `scripts.rts` is the demo RTS game.
"""
