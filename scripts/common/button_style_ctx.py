"""Scoped button-style override (ref: scripts/common/button_style_ctx.py).

The reference pushes/pops nuklear style knobs around a widget run; our
Window keeps a flat Style bag, so the context manager saves and restores
the `button_*` props it touches.
"""

import permafrost_engine_tpu.script.pf as pf


class ButtonStyle:
    """`with ButtonStyle(normal=..., text_normal=...):` — applies the given
    button style props to the window being updated, restoring the previous
    values on exit. The window is found from the update in progress (the
    caller is always inside Window.update)."""

    def __init__(self, window: "pf.Window" = None, **props):
        self._win = window
        self._props = {f"button_{k}": v for k, v in props.items()}
        self._saved = {}

    def _target(self):
        if self._win is not None:
            return self._win.style
        # default: a shared style scope on the UI system
        return pf.context().ui

    def __enter__(self):
        tgt = self._target()
        store = getattr(tgt, "props", None)
        if store is None:
            store = tgt.__dict__.setdefault("style_props", {})
        self._store = store
        for k, v in self._props.items():
            self._saved[k] = store.get(k)
            store[k] = v
        return self

    def __exit__(self, *exc):
        for k, old in self._saved.items():
            if old is None:
                self._store.pop(k, None)
            else:
                self._store[k] = old
        return False
