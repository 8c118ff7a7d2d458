"""Object placement controller (ref:
scripts/editor/view_controllers/objects_tab_vc.py): in Place mode a world
click spawns the browsed class at the ground point for the chosen
faction; in Select mode clicks use the engine's native picking; Delete
Selected zombiefies the picked entities and drops them from the scene
list."""

import permafrost_engine_tpu.script.pf as pf

import scripts.editor.globals as eg
import scripts.editor.mouse_events as mouse_events
from scripts.common.view_controllers.view_controller import ViewController
from scripts.editor.views.objects_tab_window import (
    OBJECTS_MODE_PLACE,
    OBJECTS_MODE_SELECT,
)

# the placeable roster (the reference browses assets/models; classes are
# the unit of placement here — each carries its own pfobj + stats)
from scripts.rts import units as rts_units

PLACEABLE = {
    "Knight": (rts_units.Knight, "knight.pfobj"),
    "Berzerker": (rts_units.Berzerker, "berzerker.pfobj"),
    "Mage": (rts_units.Mage, "mage.pfobj"),
    "Goblin": (rts_units.Goblin, "goblin.pfobj"),
    "Sinbad": (rts_units.Sinbad, "sinbad.pfobj"),
    "Chicken": (rts_units.Chicken, "chicken.pfobj"),
    "Deer": (rts_units.Deer, "deer.pfobj"),
    "Doe": (rts_units.Doe, "doe.pfobj"),
    "Tree (resource)": (pf.ResourceEntity, "tree.pfobj"),
    "Storage camp": (pf.StorageSiteEntity, "camp.pfobj"),
}


class ObjectsVC(ViewController):

    def __init__(self, view):
        self.view = view
        self.view.class_names = list(PLACEABLE.keys())
        self._counter = 0

    def _on_mode_changed(self, event):
        if event == OBJECTS_MODE_SELECT:
            pf.enable_unit_selection()
        else:
            pf.disable_unit_selection()

    def _on_click(self, event):
        if event["button"] != 1 or self.view.mode != OBJECTS_MODE_PLACE:
            return
        if event["consumed"] != "select" or not mouse_events.mouse_over_map:
            return
        vw, vh = pf.context().ui.virtual_resolution
        hit = pf.get_active_camera().ground_point(
            event["pos"][0], event["pos"][1], vw, vh)
        if hit is None:
            return
        name = self.view.class_names[self.view.class_idx]
        cls, pfobj = PLACEABLE[name]
        facs = pf.get_factions_list()
        fid = facs[min(self.view.faction_idx, len(facs) - 1)]["id"]
        self._counter += 1
        ent = cls(pfobj, f"{name.split()[0].lower()}{self._counter}",
                  pos=(hit[0], 0.0, hit[2]), faction_id=fid)
        eg.active_objects_list.append(ent)

    def _on_delete(self, event):
        doomed = list(pf.get_unit_selection())
        pf.clear_unit_selection()
        for ent in doomed:
            if ent in eg.active_objects_list:
                eg.active_objects_list.remove(ent)
            ent.zombiefy()

    def activate(self):
        from scripts.editor.constants import (
            EVENT_OBJECT_DELETE_SELECTION,
            EVENT_OBJECTS_TAB_MODE_CHANGED,
        )
        pf.register_ui_event_handler(EVENT_OBJECTS_TAB_MODE_CHANGED,
                                     self._on_mode_changed)
        pf.register_ui_event_handler(pf.SDL_MOUSEBUTTONDOWN, self._on_click)
        pf.register_ui_event_handler(EVENT_OBJECT_DELETE_SELECTION,
                                     self._on_delete)
        self._on_mode_changed(self.view.mode)
        self.view.show()

    def deactivate(self):
        from scripts.editor.constants import (
            EVENT_OBJECT_DELETE_SELECTION,
            EVENT_OBJECTS_TAB_MODE_CHANGED,
        )
        self.view.hide()
        pf.unregister_event_handler(EVENT_OBJECT_DELETE_SELECTION,
                                    self._on_delete)
        pf.unregister_event_handler(pf.SDL_MOUSEBUTTONDOWN, self._on_click)
        pf.unregister_event_handler(EVENT_OBJECTS_TAB_MODE_CHANGED,
                                    self._on_mode_changed)
