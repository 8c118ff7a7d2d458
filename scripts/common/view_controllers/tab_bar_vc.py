"""Tab-bar container controller (ref:
scripts/common/view_controllers/tab_bar_vc.py): hosts child VCs, keeps
exactly one active, and switches on the view's tab-change event."""

import permafrost_engine_tpu.script.pf as pf

from scripts.common.view_controllers.view_controller import ViewController


class TabBarVC(ViewController):

    def __init__(self, view, tab_change_event: int):
        self.view = view
        self._active_idx = 0
        self._children: list[ViewController] = []
        self._tce = tab_change_event

    def _on_tab_changed(self, event):
        assert 0 <= self._active_idx < len(self._children)
        assert 0 <= event < len(self._children)
        if event == self._active_idx:
            return
        self._children[self._active_idx].deactivate()
        self._active_idx = event
        self._children[self._active_idx].activate()

    def push_child(self, label: str, vc: ViewController) -> None:
        assert isinstance(vc, ViewController)
        self._children.append(vc)
        self.view.push_child(label, vc.view)

    def activate(self):
        pf.register_ui_event_handler(self._tce, self._on_tab_changed)
        if self._children:
            self._children[self._active_idx].activate()
        self.view.show()

    def deactivate(self):
        self.view.hide()
        if self._children:
            self._children[self._active_idx].deactivate()
        pf.unregister_event_handler(self._tce, self._on_tab_changed)
