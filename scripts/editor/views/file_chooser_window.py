"""File chooser dialog (ref:
scripts/editor/views/file_chooser_window.py): a path text edit with
OK/Cancel; the requesting controller stashes `purpose` to route the OK."""

import permafrost_engine_tpu.script.pf as pf

from scripts.editor.constants import (
    EVENT_FILE_CHOOSER_CANCEL,
    EVENT_FILE_CHOOSER_OK,
)


class FileChooserWindow(pf.Window):

    WIDTH = 500
    HEIGHT = 150

    def __init__(self):
        vw, vh = (1920, 1080)
        super().__init__(
            "FileChooser",
            ((vw - self.WIDTH) / 2, (vh - self.HEIGHT) / 2,
             self.WIDTH, self.HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_TITLE
            | pf.NK_WINDOW_NO_SCROLLBAR,
            resize_mask=pf.ANCHOR_X_CENTER | pf.ANCHOR_Y_CENTER)
        self.purpose = None            # "load" | "save"

    @property
    def path(self) -> str:
        return self._widget_state.get(("text", "file_path"), "")

    def open_for(self, purpose: str, initial: str = "") -> None:
        self.purpose = purpose
        self._widget_state[("text", "file_path")] = initial
        self.show()

    def update(self):
        self.layout_row_dynamic(20, 1)
        self.label(f"File path ({self.purpose}):")
        self.layout_row_dynamic(30, 1)
        path = self.text_edit("file_path", "")
        self.layout_row_dynamic(30, 2)
        if self.button_label("OK"):
            pf.global_event(EVENT_FILE_CHOOSER_OK,
                            {"purpose": self.purpose, "path": path})
        if self.button_label("Cancel"):
            pf.global_event(EVENT_FILE_CHOOSER_CANCEL, None)
