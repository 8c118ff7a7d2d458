"""Editor game-script tests: scripts/editor driven through the real
input pipeline (paint, place, delete, diplomacy, save/load via the
menu + file chooser)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import permafrost_engine_tpu.script.pf as pf  # noqa: E402

import scripts.editor.globals as eg  # noqa: E402
from scripts.editor import main as editor_main  # noqa: E402
from scripts.editor.constants import (  # noqa: E402
    EVENT_OBJECT_DELETE_SELECTION,
    EVENT_OBJECTS_TAB_MODE_CHANGED,
    EVENT_TOP_TAB_SELECTION_CHANGED,
)


@pytest.fixture(scope="module")
def editor():
    ed = editor_main.setup()
    pf.step(5)
    cam = pf.get_active_camera()
    cam.move_within_bounds_and_face((120.0, 120.0))
    yield ed


def _screen(world_xz):
    vw, vh = pf.context().ui.virtual_resolution
    return pf.get_active_camera().world_to_screen(
        (world_xz[0], 0.0, world_xz[1]), vw, vh)


def _click_world(world_xz):
    s = _screen(world_xz)
    pf.inject_mouse_motion(s[0], s[1])
    return pf.inject_mouse_click(s[0], s[1])


def test_paint_height_brush(editor):
    tv = editor["terrain_vc"].view
    tv.brush_size_idx = 1          # 3x3
    tv.brush_mode_idx = 0          # height
    tv.height = 5
    _click_world((120.0, 120.0))
    assert int((np.asarray(eg.active_map.base_height) == 5).sum()) == 9


def test_paint_blockers_hits_nav(editor):
    tv = editor["terrain_vc"].view
    tv.brush_size_idx = 0          # 1x1
    tv.brush_mode_idx = 2          # blockers
    tv.pathable = False
    _click_world((152.0, 152.0))
    from permafrost_engine_tpu.core.config import UNITS_PER_TILE
    r = int(152.0 // UNITS_PER_TILE)
    c = int(152.0 // UNITS_PER_TILE)
    assert not eg.active_map.pathable[r, c]
    # the engine re-baked nav: the tile is impassable on layer 0 (one
    # map tile spans 2x2 nav tiles — FIELD_RES 64 vs TILES_PER_CHUNK 32)
    from permafrost_engine_tpu.core.config import COST_IMPASSABLE
    eng = pf.context().engine
    assert int(np.asarray(eng.state.nav.cost_base)[0, 2 * r, 2 * c]) \
        == COST_IMPASSABLE


def test_place_select_delete_objects(editor):
    pf.global_event(EVENT_TOP_TAB_SELECTION_CHANGED, 1)
    pf.step(1)
    ov = editor["objects_vc"].view
    ov.class_idx = ov.class_names.index("Goblin")
    ov.faction_idx = 0
    assert _click_world((200.0, 80.0)) == "select"
    assert len(eg.active_objects_list) == 1
    assert eg.active_objects_list[0].name.startswith("goblin")

    # switch to Select mode and pick it with a click
    ov.mode = 1
    pf.global_event(EVENT_OBJECTS_TAB_MODE_CHANGED, 1)
    pf.step(1)
    _click_world((200.0, 80.0))
    pf.step(1)
    assert len(pf.get_unit_selection()) == 1

    pf.global_event(EVENT_OBJECT_DELETE_SELECTION, None)
    pf.step(1)
    assert eg.active_objects_list == []
    assert pf.get_unit_selection() == []


def test_tab_switch_disables_painting(editor):
    # objects tab is active from the previous test: terrain clicks must
    # not paint
    before = np.asarray(eg.active_map.base_height).copy()
    tv = editor["terrain_vc"].view
    tv.brush_mode_idx = 0
    tv.height = 8
    editor["objects_vc"].view.mode = 0
    pf.global_event(EVENT_OBJECTS_TAB_MODE_CHANGED, 0)
    pf.step(1)
    _click_world((280.0, 280.0))
    assert (np.asarray(eg.active_map.base_height) == before).all()
    # back to terrain
    pf.global_event(EVENT_TOP_TAB_SELECTION_CHANGED, 0)
    pf.step(1)


def test_diplomacy_tab(editor):
    win = editor["diplo_vc"].view
    win._widget_state[("text", "new_fac_name")] = "Invaders"
    win.simulate_click("Add Faction")
    win._render()
    facs = pf.get_factions_list()
    assert any(f["name"] == "Invaders" for f in facs)
    a, b = facs[0]["id"], facs[-1]["id"]
    win.simulate_click(
        f"{facs[0]['name']} vs {facs[-1]['name']}: PEACE")
    win._render()
    assert pf.get_diplomacy_state(a, b) == pf.DIPLOMACY_STATE_WAR


def test_menu_save_load_roundtrip(editor, tmp_path):
    path = str(tmp_path / "edited.pfmap")
    editor["menu"].show()
    editor["menu"].simulate_click("Save Map As")
    pf.step(1)
    pf.step(1)
    chooser = editor["menu_vc"].chooser
    assert chooser.shown and chooser.purpose == "save"
    chooser._widget_state[("text", "file_path")] = path
    chooser.simulate_click("OK")
    pf.step(1)
    pf.step(1)
    assert os.path.exists(path) and eg.map_filename == path

    # wipe with New, then load the file back
    editor["menu"].show()
    editor["menu"].simulate_click("New")
    pf.step(1)
    pf.step(1)
    assert (np.asarray(eg.active_map.base_height) == 0).all()

    editor["menu"].show()
    editor["menu"].simulate_click("Load Map")
    pf.step(1)
    pf.step(1)
    assert chooser.shown and chooser.purpose == "load"
    chooser._widget_state[("text", "file_path")] = path
    chooser.simulate_click("OK")
    pf.step(1)
    pf.step(1)
    assert int((np.asarray(eg.active_map.base_height) == 5).sum()) == 9
