"""Scoped button-style override (ref: scripts/common/button_style_ctx.py).

Exactly the reference's pattern: save every attribute of the GLOBAL
pf.button_style object, apply the overrides, run the widget block, restore.
Buttons recorded inside the block snapshot the overridden style (script/
ui.py button_label), so the scoped colors land on exactly those widgets.
"""

import permafrost_engine_tpu.script.pf as pf


class ButtonStyle:
    """`with ButtonStyle(normal=..., text_normal=...):` — applies the given
    props to pf.button_style for the duration of the block."""

    def __init__(self, **kwargs):
        self.__style = kwargs
        self.__saved = {}

    def __enter__(self):
        saved_attrs = [attr for attr in pf.button_style.attrs()]
        for attr in saved_attrs:
            self.__saved[attr] = getattr(pf.button_style, attr)
        for attr, val in self.__style.items():
            setattr(pf.button_style, attr, val)
        return self

    def __exit__(self, *exc):
        for attr, val in self.__saved.items():
            setattr(pf.button_style, attr, val)
        return False
