"""Layer-8 game-script tests: the scripts/rts game driven through the
real input pipeline (ref: the reference validates its scripts/rts game
manually in-engine; here the MVC stack, action pad, hotkeys, settings and
session dialogs are exercised headlessly)."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

import permafrost_engine_tpu.script.pf as pf  # noqa: E402

import scripts.rts.globals as game_globals  # noqa: E402
from scripts.rts import main as game_main  # noqa: E402
from scripts.rts import units  # noqa: E402


@pytest.fixture(scope="module")
def game():
    g = game_main.setup()
    pf.step(5)
    yield g


def test_scene_loaded(game):
    objs = game_globals.scene_objs
    assert len(objs) >= 15
    assert any(isinstance(o, units.Knight) for o in objs)
    assert any(isinstance(o, units.Goblin) for o in objs)
    assert any(isinstance(o, units.Deer) for o in objs)
    facs = pf.get_factions_list()
    assert [f["name"] for f in facs][:4] == \
        ["Nature", "Kingdom", "Horde", "Raiders"]
    # war set up between kingdom and horde
    assert pf.get_diplomacy_state(1, 2) == pf.DIPLOMACY_STATE_WAR


def test_unit_stat_blocks(game):
    k = next(o for o in game_globals.scene_objs
             if isinstance(o, units.Knight))
    b = next(o for o in game_globals.scene_objs
             if isinstance(o, units.Berzerker))
    m = next(o for o in game_globals.scene_objs
             if isinstance(o, units.Mage))
    # ref: scripts/rts/units/{knight,berzerker,mage}.py stat blocks
    assert k.max_hp == 150.0 and k.base_dmg == 50.0
    assert b.max_hp == 220.0 and b.base_dmg == 80.0
    assert m.attack_range == 50.0


def test_hotkey_conflict_detected(game):
    import scripts.rts.action as action

    class Clashing(units.Knight):
        def action(self, idx):
            if idx == 5:    # M clashes with AnimMoveable's Move slot
                return action.ActionDesc("i", "i", "i", lambda: None,
                                         hotkey=pf.SDL_SCANCODE_M)
            return super().action(idx)

    with pytest.raises(RuntimeError, match="hotkey"):
        Clashing("knight.pfobj", "clash", pos=(300, 0, 300), faction_id=1)


def test_box_select_fills_action_pad(game):
    knights = [o for o in game_globals.scene_objs
               if isinstance(o, units.Knight)]
    vw, vh = pf.context().ui.virtual_resolution
    cam = pf.get_active_camera()
    k0 = knights[0].pos
    cam.move_within_bounds_and_face((k0[0], k0[2]))

    def screen_of(wxz):
        return cam.world_to_screen((wxz[0], 0.0, wxz[1]), vw, vh)

    a = screen_of((k0[0] - 30, k0[2] - 30))
    b = screen_of((k0[0] + 60, k0[2] + 60))
    picked = pf.inject_mouse_drag(a[0], a[1], b[0], b[1])
    assert picked
    pf.step(2)          # SELECTION_CHANGED dispatch -> pad fills

    pad = game["action_pad_vc"].view
    labels = [act.label for act in pad.actions if act is not None]
    assert "Move" in labels and "Stop" in labels
    assert "Hold" in labels and "Attack" in labels

    # the Attack hotkey arms attack mode; the next ground click orders it
    pf.inject_key_down(pf.SDL_SCANCODE_A)
    pf.inject_key_up(pf.SDL_SCANCODE_A)
    tgt = screen_of((k0[0], k0[2] + 40))
    assert pf.inject_mouse_click(tgt[0], tgt[1]) == "order:attack"
    pf.step(10)
    sel = pf.get_unit_selection()
    assert any(getattr(e, "uid", None) is not None for e in sel)


def test_pause_resume_via_demo_window(game):
    game["demo_vc"].view.simulate_click("Pause")
    pf.step(1)          # render consumes click, queues event
    pf.step(1)          # dispatch -> paused
    assert pf.get_simstate() == pf.G_PAUSED_UI_RUNNING
    game["demo_vc"].view.simulate_click("Resume")
    pf.step(1)
    pf.step(1)
    assert pf.get_simstate() == pf.G_RUNNING


def test_pause_hotkey(game):
    pf.inject_key_down(pf.SDL_SCANCODE_P)
    pf.inject_key_up(pf.SDL_SCANCODE_P)
    assert pf.get_simstate() == pf.G_PAUSED_UI_RUNNING
    pf.inject_key_down(pf.SDL_SCANCODE_P)
    pf.inject_key_up(pf.SDL_SCANCODE_P)
    assert pf.get_simstate() == pf.G_RUNNING


def test_camera_toggle_key(game):
    before = pf.get_active_camera()
    pf.inject_key_down(pf.SDL_SCANCODE_C)
    pf.inject_key_up(pf.SDL_SCANCODE_C)
    after = pf.get_active_camera()
    assert after is not before
    assert after.mode == pf.CAM_MODE_FPS
    pf.inject_key_down(pf.SDL_SCANCODE_C)
    pf.inject_key_up(pf.SDL_SCANCODE_C)
    assert pf.get_active_camera() is before


def test_settings_dialog_apply(game):
    from scripts.common.constants import EVENT_SETTINGS_APPLY
    from scripts.rts.constants import EVENT_SETTINGS_SHOW

    pf.global_event(EVENT_SETTINGS_SHOW, None)
    pf.step(1)
    tab = game["demo_vc"].settings_vc.view
    assert tab.shown and tab.labels == ["Video", "Game"]

    video_vc = game["demo_vc"].settings_vc._children[0]
    video_vc.view.shadows_on = False
    pf.global_event(EVENT_SETTINGS_APPLY, "video")
    pf.step(1)
    # dirty gate: nothing applied until the changed event marks it dirty
    video_vc.view.dirty = True
    pf.global_event(EVENT_SETTINGS_APPLY, "video")
    pf.step(1)
    assert pf.settings_get("pf.video.shadows_enabled") is False
    pf.settings_set("pf.video.shadows_enabled", True)

    from scripts.common.constants import EVENT_SETTINGS_HIDE
    pf.global_event(EVENT_SETTINGS_HIDE, None)
    pf.step(1)
    assert not tab.shown


def test_controlled_faction_switch(game):
    from scripts.rts.constants import EVENT_CONTROLLED_FACTION_CHANGED
    pf.global_event(EVENT_CONTROLLED_FACTION_CHANGED, 2)
    pf.step(1)
    facs = pf.get_factions_list()
    assert facs[2]["controllable"] is True
    assert facs[1]["controllable"] is False
    # selection was cleared on the switch
    assert pf.get_unit_selection() == []
    pf.global_event(EVENT_CONTROLLED_FACTION_CHANGED, 1)
    pf.step(1)


def test_session_dialog_roundtrip(game, tmp_path):
    from scripts.rts.constants import EVENT_SESSION_SHOW
    path = str(tmp_path / "game_session.bin")
    pf.global_event(EVENT_SESSION_SHOW, None)
    pf.step(1)
    sess = game["demo_vc"].session_view
    assert not sess.hidden
    sess._widget_state[("text", "session_path")] = path
    sess.simulate_click("Save")
    pf.step(1)
    pf.step(1)
    assert os.path.exists(path)
    sess.show()
    sess._widget_state[("text", "session_path")] = path
    sess.simulate_click("Load")
    pf.step(1)
    pf.step(1)
    assert pf.get_simstate() == pf.G_RUNNING
