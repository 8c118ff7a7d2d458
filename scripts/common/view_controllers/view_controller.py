"""ViewController base (ref:
scripts/common/view_controllers/view_controller.py): game UI is MVC —
views are dumb Window subclasses that render state and fire events;
controllers own the state transitions and event wiring."""

from abc import ABC, abstractmethod


class ViewController(ABC):

    @abstractmethod
    def activate(self):
        """Install event handlers and show the view."""

    @abstractmethod
    def deactivate(self):
        """Hide the view and remove every handler activate installed."""
