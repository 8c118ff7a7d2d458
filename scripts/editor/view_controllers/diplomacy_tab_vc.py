"""Diplomacy controller (ref:
scripts/editor/view_controllers/diplomacy_tab_vc.py). The view mutates
factions/diplomacy directly through pf; the controller only manages
lifecycle (the reference splits identically)."""

from scripts.common.view_controllers.view_controller import ViewController


class DiplomacyVC(ViewController):

    def __init__(self, view):
        self.view = view

    def activate(self):
        self.view.show()

    def deactivate(self):
        self.view.hide()
