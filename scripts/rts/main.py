"""RTS demo game entry point (ref: scripts/rts/main.py): global configs,
map/scene setup, diplomacy, camera + pause key handlers, and the MVC UI
stack. `setup()` boots everything and returns the live controllers;
running the module drives a scripted interactive session through the real
input pipeline (the engine is headless — clicks and keys arrive through
pf.inject_*, exactly as the live viewer sends them)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

if __name__ == "__main__" and "--tpu" not in sys.argv:
    # the backend must be pinned BEFORE anything touches jax (the pf
    # import below builds device constants)
    import jax

    jax.config.update("jax_platforms", "cpu")

import permafrost_engine_tpu.script.pf as pf

import scripts.rts.globals as game_globals
from scripts.rts import units
from scripts.rts.constants import EVENT_SIMSTATE_CHANGE  # noqa: F401
from scripts.rts.view_controllers.action_pad_vc import ActionPadVC
from scripts.rts.view_controllers.demo_vc import DemoVC
from scripts.rts.views.action_pad_window import ActionPadWindow
from scripts.rts.views.demo_window import DemoWindow

SCENE_CLASSES = {
    "Knight": units.Knight,
    "Berzerker": units.Berzerker,
    "Mage": units.Mage,
    "Goblin": units.Goblin,
    "Sinbad": units.Sinbad,
    "Chicken": units.Chicken,
    "Deer": units.Deer,
    "Doe": units.Doe,
}

MAPS_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                        "..", "assets", "maps"))


def ensure_demo_assets() -> None:
    """Generate assets/maps/demo.pfmap + demo.pfscene on first run (the
    reference ships binary map assets; ours are procedurally generated
    and cached as the same file formats)."""
    os.makedirs(MAPS_DIR, exist_ok=True)
    map_path = os.path.join(MAPS_DIR, "demo.pfmap")
    if not os.path.exists(map_path):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "..", "tools"))
        from mapgen import make_battle_map

        from permafrost_engine_tpu.assets.pfmap import write_pfmap
        with open(map_path, "w") as f:
            f.write(write_pfmap(make_battle_map()))
    scene_path = os.path.join(MAPS_DIR, "demo.pfscene")
    if not os.path.exists(scene_path):
        lines = ["# RTS demo scene: <Class> <name> <pfobj> <x> <y> <z> ..."]
        # Kingdom (faction 1) west of the wall
        for i in range(4):
            lines.append(f"Knight knight{i} knight.pfobj "
                         f"{180 + 12 * i} 0 {420} faction_id=1")
        for i in range(2):
            lines.append(f"Berzerker berz{i} berzerker.pfobj "
                         f"{186 + 16 * i} 0 {450} faction_id=1")
        lines.append("Mage mage0 mage.pfobj 160 0 436 faction_id=1")
        lines.append("Sinbad sinbad sinbad.pfobj 210 0 436 faction_id=1")
        # Horde (faction 2) on the eastern plateau
        for i in range(4):
            lines.append(f"Goblin gob{i} goblin.pfobj "
                         f"{800 + 10 * i} 0 {420 + 6 * i} faction_id=2")
        lines.append("Berzerker warchief berzerker.pfobj "
                     "840 0 440 faction_id=2")
        # Raiders (faction 3) south-east
        for i in range(3):
            lines.append(f"Goblin raider{i} goblin.pfobj "
                         f"{760 + 14 * i} 0 {760} faction_id=3")
        # wildlife (faction 0, Nature) near the north river bank
        lines.append("Deer deer0 deer.pfobj 420 0 160 faction_id=0")
        lines.append("Doe doe0 doe.pfobj 436 0 172 faction_id=0")
        lines.append("Chicken chicken0 chicken.pfobj 400 0 180 faction_id=0")
        with open(scene_path, "w") as f:
            f.write("\n".join(lines) + "\n")


def setup(cfg=None) -> dict:
    """Boot the whole game. Returns the live pieces for driving/tests."""
    from permafrost_engine_tpu.core.config import EngineConfig

    ensure_demo_assets()
    pf.init(cfg or EngineConfig(max_ents=256, max_projectiles=256,
                                field_slab_slots=64, los_slab_slots=64))

    # ---- global configs (ref: scripts/rts/main.py lighting + font) -------
    pf.set_ambient_light_color((1.0, 1.0, 1.0))
    pf.set_emit_light_color((1.0, 1.0, 1.0))
    pf.set_emit_light_pos((1664.0, 1024.0, 384.0))
    pf.set_active_font("OptimusPrinceps.ttf")

    # ---- factions + diplomacy (ref: main.py set_diplomacy_state calls) ----
    nature = pf.add_faction("Nature", (140, 190, 130), controllable=False)
    kingdom = pf.add_faction("Kingdom", (60, 120, 255))
    horde = pf.add_faction("Horde", (230, 60, 60), controllable=False)
    raiders = pf.add_faction("Raiders", (240, 180, 40), controllable=False)
    pf.set_diplomacy_state(kingdom, horde, pf.DIPLOMACY_STATE_WAR)
    pf.set_diplomacy_state(kingdom, raiders, pf.DIPLOMACY_STATE_WAR)
    pf.set_diplomacy_state(horde, raiders, pf.DIPLOMACY_STATE_WAR)

    # ---- map + scene (absolute paths: os.path.join ignores basedir) ------
    pf.load_map(os.path.join(MAPS_DIR, "demo.pfmap"))
    game_globals.scene_objs = pf.load_scene(
        os.path.join(MAPS_DIR, "demo.pfscene"), classes=SCENE_CLASSES)
    game_globals.scene_regions = [
        pf.Region("river_crossing_north", (470.0, 0.0, 340.0), radius=60.0),
        pf.Region("river_crossing_south", (470.0, 0.0, 690.0), radius=60.0),
    ]
    pf.set_skybox("assets/skyboxes/clouds_blue")

    # ---- global key handlers (ref: main.py toggle_camera/toggle_pause) ----
    main_cam = pf.get_active_camera()
    debug_cam = pf.Camera(mode=pf.CAM_MODE_FPS, pos=(0.0, 175.0, 0.0),
                          pitch=-65.0, yaw=135.0)
    cams = {"main": main_cam, "debug": debug_cam, "active": main_cam}

    def toggle_camera(event):
        if event[0] == pf.SDL_SCANCODE_C and not pf.ui_text_edit_has_focus():
            cams["active"] = (cams["debug"] if cams["active"] is cams["main"]
                              else cams["main"])
            pf.set_active_camera(cams["active"])

    def toggle_pause(event):
        if event[0] == pf.SDL_SCANCODE_P and not pf.ui_text_edit_has_focus():
            if pf.get_simstate() == pf.G_RUNNING:
                pf.set_simstate(pf.G_PAUSED_UI_RUNNING)
            else:
                pf.set_simstate(pf.G_RUNNING)

    pf.register_ui_event_handler(pf.SDL_KEYDOWN, toggle_camera)
    pf.register_ui_event_handler(pf.SDL_KEYDOWN, toggle_pause)

    # ---- UI stack -----------------------------------------------------------
    demo_vc = DemoVC(DemoWindow())
    demo_vc.activate()
    action_pad_vc = ActionPadVC(ActionPadWindow())
    action_pad_vc.activate()

    return {"demo_vc": demo_vc, "action_pad_vc": action_pad_vc,
            "cams": cams, "factions": {"nature": nature,
                                       "kingdom": kingdom, "horde": horde,
                                       "raiders": raiders},
            "handlers": (toggle_camera, toggle_pause)}


def main() -> None:
    game = setup()
    knights = [e for e in game_globals.scene_objs
               if isinstance(e, units.Knight)]
    goblins = [e for e in game_globals.scene_objs
               if isinstance(e, units.Goblin)]
    pf.step(30)

    # drive through the REAL input pipeline: select the knights with a
    # box drag, arm Attack via its hotkey, click the horde's position
    vw, vh = pf.context().ui.virtual_resolution
    cam = pf.get_active_camera()
    k0 = knights[0].pos
    cam.move_within_bounds_and_face((k0[0], k0[2]))

    def screen_of(world_xz):
        s = cam.world_to_screen((world_xz[0], 0.0, world_xz[1]), vw, vh)
        return s if s is not None else (vw / 2, vh / 2)

    a = screen_of((k0[0] - 30, k0[2] - 30))
    b = screen_of((k0[0] + 60, k0[2] + 60))
    picked = pf.inject_mouse_drag(a[0], a[1], b[0], b[1])
    print(f"box-selected {len(picked)} units")
    assert picked, "box selection picked nothing"
    pf.step(2)            # SELECTION_CHANGED dispatch -> action pad fills

    pf.inject_key_down(pf.SDL_SCANCODE_A)      # action-pad Attack hotkey
    pf.inject_key_up(pf.SDL_SCANCODE_A)
    # aim between the demo window (top-left) and the action pad
    # (bottom-right): straight below the camera centre
    tgt = screen_of((k0[0], k0[2] + 40))
    consumed = pf.inject_mouse_click(tgt[0], tgt[1])
    print(f"attack order consumed as: {consumed}")
    assert consumed == "order:attack", consumed

    for _ in range(5):
        pf.step(60)
    moving = sum(1 for k in knights if not k.zombie and k.moving)
    alive_gobs = sum(0 if g.zombie else (1 if g.hp > 0 else 0)
                     for g in goblins)
    print(f"knights hunting: {moving} moving, "
          f"goblins alive: {alive_gobs}")

    # pause via the demo window's button: the click is consumed at the
    # next render, the fired event dispatches on the step after (queued
    # delivery, ref: E_Global_Notify)
    game["demo_vc"].view.simulate_click("Pause")
    pf.step(1)            # render consumes the click, queues the event
    pf.step(1)            # event services -> simstate flips
    print(f"simstate after Pause click: {pf.get_simstate()}")
    assert pf.get_simstate() == pf.G_PAUSED_UI_RUNNING
    game["demo_vc"].view.simulate_click("Resume")
    pf.step(1)
    pf.step(1)
    assert pf.get_simstate() == pf.G_RUNNING

    # save/load through the session dialog
    from scripts.rts.constants import EVENT_SESSION_SHOW
    pf.global_event(EVENT_SESSION_SHOW, None)
    pf.step(1)
    sess = game["demo_vc"].session_view
    assert not sess.hidden
    sess._widget_state[("text", "session_path")] = "/tmp/rts_game_session.bin"
    sess.simulate_click("Save")
    pf.step(1)
    pf.step(1)
    assert os.path.exists("/tmp/rts_game_session.bin")
    sess.show()
    sess._widget_state[("text", "session_path")] = "/tmp/rts_game_session.bin"
    sess.simulate_click("Load")
    pf.step(1)
    pf.step(1)
    print("session round-trip ok")
    print("RTS GAME COMPLETE")


if __name__ == "__main__":
    main()
