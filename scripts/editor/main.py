"""Map editor entry point (ref: scripts/editor/main.py): boots the engine
with unit selection off, installs the mouse-over-map tracker, builds the
Terrain/Objects/Diplomacy tab stack and the menu, and (when run directly)
drives a scripted editing session through the real input pipeline —
paint, place, save, reload."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

if __name__ == "__main__" and "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import permafrost_engine_tpu.script.pf as pf

import scripts.editor.globals as eg
import scripts.editor.mouse_events as mouse_events
from scripts.common.view_controllers.tab_bar_vc import TabBarVC
from scripts.editor.constants import (
    DEFAULT_FACTION_COLOR,
    DEFAULT_FACTION_NAME,
    EVENT_TOP_TAB_SELECTION_CHANGED,
    UI_LEFT_PANE_WIDTH,
)
from scripts.editor.view_controllers.diplomacy_tab_vc import DiplomacyVC
from scripts.editor.view_controllers.menu_vc import MenuVC
from scripts.editor.view_controllers.objects_tab_vc import ObjectsVC
from scripts.editor.view_controllers.terrain_tab_vc import TerrainTabVC
from scripts.editor.views.diplomacy_tab_window import DiplomacyTabWindow
from scripts.editor.views.menu_window import Menu, MenuButtonWindow
from scripts.editor.views.objects_tab_window import ObjectsTabWindow
from scripts.editor.views.tab_bar_window import TabBarWindow
from scripts.editor.views.terrain_tab_window import TerrainTabWindow


def setup(map_path: str | None = None, cfg=None) -> dict:
    from permafrost_engine_tpu.assets.pfmap import make_flat_map, parse_pfmap
    from permafrost_engine_tpu.core.config import EngineConfig

    pf.init(cfg or EngineConfig(max_ents=256, max_projectiles=256,
                                field_slab_slots=64, los_slab_slots=64))

    # ---- global settings (ref: editor main.py) ----------------------------
    pf.set_ambient_light_color((1.0, 1.0, 1.0))
    pf.set_emit_light_color((1.0, 1.0, 1.0))
    pf.set_emit_light_pos((1664.0, 1024.0, 384.0))
    pf.set_active_font("OptimusPrinceps.ttf")
    pf.disable_unit_selection()
    pf.disable_fog_of_war()
    mouse_events.install()

    # ---- map ---------------------------------------------------------------
    engine = pf.context().engine
    if map_path:
        with open(map_path) as f:
            eg.active_map = parse_pfmap(f.read())
        eg.map_filename = map_path
    else:
        eg.active_map = make_flat_map(engine.cfg.chunks_r,
                                      engine.cfg.chunks_c,
                                      num_materials=3)
        eg.active_map.materials = [("Grass", "grass.png"),
                                   ("Rock", "rock.png"),
                                   ("Sand", "sand.png")]
        eg.map_filename = None
    engine.load_map_data(eg.active_map)
    eg.active_objects_list = []
    pf.add_faction(DEFAULT_FACTION_NAME, DEFAULT_FACTION_COLOR)

    # the minimap moves right of the left tool pane (ref: editor main.py)
    mm = pf.get_minimap_position()
    pf.set_minimap_position(UI_LEFT_PANE_WIDTH + mm[0], mm[1])

    # ---- UI stack ------------------------------------------------------------
    terrain_vc = TerrainTabVC(TerrainTabWindow())
    objects_vc = ObjectsVC(ObjectsTabWindow())
    diplo_vc = DiplomacyVC(DiplomacyTabWindow())

    tab_bar_vc = TabBarVC(TabBarWindow(), EVENT_TOP_TAB_SELECTION_CHANGED)
    tab_bar_vc.push_child("Terrain", terrain_vc)
    tab_bar_vc.push_child("Objects", objects_vc)
    tab_bar_vc.push_child("Diplomacy", diplo_vc)
    tab_bar_vc.activate()

    menu = Menu()
    menu_vc = MenuVC(menu)
    menu_vc.activate()
    menu_button = MenuButtonWindow(menu)
    menu_button.show()

    return {"tab_bar_vc": tab_bar_vc, "terrain_vc": terrain_vc,
            "objects_vc": objects_vc, "diplo_vc": diplo_vc,
            "menu_vc": menu_vc, "menu": menu, "menu_button": menu_button}


def main() -> None:
    ed = setup(sys.argv[1] if len(sys.argv) > 1
               and not sys.argv[1].startswith("--") else None)
    pf.step(5)
    vw, vh = pf.context().ui.virtual_resolution
    cam = pf.get_active_camera()
    cam.move_within_bounds_and_face((120.0, 120.0))

    # paint a 5x5 hill through a real click
    tv = ed["terrain_vc"].view
    tv.brush_size_idx = 2          # 5x5
    tv.height = 6
    s = cam.world_to_screen((120.0, 0.0, 120.0), vw, vh)
    pf.inject_mouse_motion(s[0], s[1])
    pf.inject_mouse_click(s[0], s[1])
    import numpy as np
    painted = int((np.asarray(eg.active_map.base_height) == 6).sum())
    print(f"painted tiles at height 6: {painted}")
    assert painted == 25

    # switch to the Objects tab and place a knight
    pf.global_event(EVENT_TOP_TAB_SELECTION_CHANGED, 1)
    pf.step(1)
    s2 = cam.world_to_screen((200.0, 0.0, 60.0), vw, vh)
    pf.inject_mouse_motion(s2[0], s2[1])
    pf.inject_mouse_click(s2[0], s2[1])
    print(f"placed objects: {[e.name for e in eg.active_objects_list]}")
    assert len(eg.active_objects_list) == 1

    # save through the menu -> file chooser
    ed["menu"].show()
    ed["menu"].simulate_click("Save Map")
    pf.step(1)            # render consumes click -> queues event
    pf.step(1)            # menu handler opens chooser (save-as: no name)
    chooser = ed["menu_vc"].chooser
    assert chooser.shown and chooser.purpose == "save"
    chooser._widget_state[("text", "file_path")] = "/tmp/edited.pfmap"
    chooser.simulate_click("OK")
    pf.step(1)
    pf.step(1)
    assert os.path.exists("/tmp/edited.pfmap")

    # reload it and confirm the hill round-tripped
    from permafrost_engine_tpu.assets.pfmap import parse_pfmap
    with open("/tmp/edited.pfmap") as f:
        m2 = parse_pfmap(f.read())
    assert int((np.asarray(m2.base_height) == 6).sum()) == 25
    print("map save/reload round-trip ok")
    print("EDITOR SESSION COMPLETE")


if __name__ == "__main__":
    main()
