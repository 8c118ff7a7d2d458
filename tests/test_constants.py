"""Constant-surface conformance (ref: src/script/py_constants.c exposes
~781 names; the full tables live in script/constants.py)."""

import permafrost_engine_tpu.script.pf as pf
from permafrost_engine_tpu.core.events import EventType


def _numeric_consts():
    return {
        n: getattr(pf, n) for n in dir(pf)
        if (n.isupper() or n == "_CURSOR_MAX")
        and isinstance(getattr(pf, n), (int, float))
    }


def test_constant_count_matches_reference_scale():
    consts = _numeric_consts()
    # the reference exposes 781 constants (py_constants.c PY_EXPOSE_ENUM)
    assert len(consts) >= 781, len(consts)


def test_sdl_scancode_values_are_real_sdl():
    # public SDL_scancode.h values — scripts persist these in settings/saves
    assert pf.SDL_SCANCODE_A == 4
    assert pf.SDL_SCANCODE_Z == 29
    assert pf.SDL_SCANCODE_1 == 30
    assert pf.SDL_SCANCODE_0 == 39
    assert pf.SDL_SCANCODE_RETURN == 40
    assert pf.SDL_SCANCODE_SPACE == 44
    assert pf.SDL_SCANCODE_F1 == 58
    assert pf.SDL_SCANCODE_F12 == 69
    assert pf.SDL_SCANCODE_LEFT == 80
    assert pf.SDL_SCANCODE_UP == 82
    assert pf.SDL_SCANCODE_KP_0 == 98
    assert pf.SDL_SCANCODE_LCTRL == 224
    assert pf.SDL_SCANCODE_RGUI == 231
    assert pf.SDL_SCANCODE_AUDIOFASTFORWARD == 286
    scancodes = [n for n in _numeric_consts() if n.startswith("SDL_SCANCODE_")]
    assert len(scancodes) >= 237  # the reference's exposed set


def test_sdl_keycodes_follow_the_public_mapping():
    # printable keys are ASCII; the rest are scancode | SDLK_SCANCODE_MASK
    assert pf.SDLK_a == ord("a")
    assert pf.SDLK_9 == ord("9")
    assert pf.SDLK_SPACE == ord(" ")
    assert pf.SDLK_RETURN == ord("\r")
    assert pf.SDLK_ESCAPE == 27
    assert pf.SDLK_DELETE == 127
    assert pf.SDLK_UP == (pf.SDL_SCANCODE_UP | (1 << 30))
    assert pf.SDLK_F5 == (pf.SDL_SCANCODE_F5 | (1 << 30))
    assert pf.SDLK_KP_ENTER == (pf.SDL_SCANCODE_KP_ENTER | (1 << 30))


def test_keymods():
    assert pf.KMOD_NONE == 0
    assert pf.KMOD_CTRL == (pf.KMOD_LCTRL | pf.KMOD_RCTRL)
    assert pf.KMOD_SHIFT == (pf.KMOD_LSHIFT | pf.KMOD_RSHIFT)
    assert pf.KMOD_ALT == (pf.KMOD_LALT | pf.KMOD_RALT)
    assert pf.KMOD_GUI == (pf.KMOD_LGUI | pf.KMOD_RGUI)


def test_sdl_event_types_and_buttons():
    assert pf.SDL_QUIT == 0x100
    assert pf.SDL_KEYDOWN == 0x300
    assert pf.SDL_MOUSEWHEEL == 0x403
    assert pf.SDL_TEXTINPUT == 0x303
    assert pf.SDL_WINDOWEVENT == 0x200
    assert pf.SDL_LASTEVENT == 0xFFFF
    assert pf.SDL_BUTTON_LEFT == 1
    assert pf.SDL_BUTTON_RIGHT == 3
    assert (pf.SDL_PRESSED, pf.SDL_RELEASED) == (1, 0)


def test_engine_event_enum_covers_reference_surface():
    # every EVENT_* the reference exposes must exist under its spelling
    ref_events = """
    UPDATE_START UPDATE_END UPDATE_UI RENDER_3D_PRE RENDER_3D_POST
    RENDER_UI RENDER_FINISH SELECTED_TILE_CHANGED NEW_GAME
    UNIT_SELECTION_CHANGED 60HZ_TICK 30HZ_TICK 20HZ_TICK 10HZ_TICK
    1HZ_TICK ANIM_FINISHED ANIM_CYCLE_FINISHED MOVE_ISSUED MOTION_START
    MOTION_END ATTACK_START ENTITY_DEATH ENTITY_DEATH_IMMEDIATE
    ATTACK_END GAME_SIMSTATE_CHANGED SESSION_LOADED SESSION_POPPED
    SESSION_SAVED SESSION_FAIL_LOAD SESSION_FAIL_SAVE
    SCRIPT_TASK_EXCEPTION SCRIPT_TASK_FINISHED BUILD_BEGIN BUILD_END
    BUILD_FAIL_FOUND BUILD_TARGET_ACQUIRED BUILDING_FOUNDED
    BUILDING_COMPLETED BUILDING_CONSTRUCTED ENTITY_DIED ENTITY_STOP
    HARVEST_BEGIN HARVEST_END HARVEST_TARGET_ACQUIRED
    TRANSPORT_TARGET_ACQUIRED STORAGE_TARGET_ACQUIRED
    STORAGE_SITE_AMOUNT_CHANGED RESOURCE_DROPPED_OFF RESOURCE_PICKED_UP
    RESOURCE_EXHAUSTED RESOURCE_AMOUNT_CHANGED ENTERED_REGION
    EXITED_REGION UPDATE_FACTION PROJECTILE_DISAPPEAR PROJECTILE_HIT
    ENTITY_DISAPPEARED ORDER_ISSUED MOVABLE_ENTITY_UNBLOCK
    MOVABLE_ENTITY_BLOCK BUILDING_PLACED BUILDING_REMOVED
    RALLY_POINT_SET UNIT_BECAME_IDLE UNIT_BECAME_ACTIVE ENGINE_LAST
    """.split()
    missing = [e for e in ref_events if not hasattr(pf, f"EVENT_{e}")]
    assert not missing, missing
    assert pf.EVENT_20HZ_TICK == int(EventType.TICK_20HZ)
    assert pf.EVENT_ENTERED_REGION == int(EventType.REGION_ENTERED)


def test_enum_families_present():
    assert pf.CURSOR_POINTER == 0 and pf._CURSOR_MAX == 16
    assert pf.TILETYPE_FLAT == 0x0 and pf.TILETYPE_CORNER_CONVEX_NE == 0xC
    assert pf.TILES_PER_CHUNK_WIDTH == 32 and pf.X_COORDS_PER_TILE == 8
    assert pf.MAX_FACTIONS == 15
    assert pf.AIR_UNIT_HEIGHT == 20.0
    assert pf.ANIM_MODE_LOOP == 0 and pf.ANIM_MODE_ONCE == 1
    assert pf.MUSIC_MODE_SHUFFLE == 2
    assert pf.TRANSPORT_STRATEGY_GATHERING == 2
    assert pf.HB_MODE_NEVER == 2
    assert pf.SS_UI_SHOW_SELECTED == 1
    assert pf.REGION_RECTANGLE == 1
    assert pf.CAM_PROJ_ORTHOGRAPHIC == 1
    assert pf.PF_WF_BORDERLESS_WIN == 2
    assert pf.FORMATION_RANK == 1 or hasattr(pf, "FORMATION_RANK")


def test_nuklear_enums_match_public_values():
    assert pf.NK_WINDOW_BORDER == 1 and pf.NK_WINDOW_NO_INPUT == 1 << 10
    assert pf.NK_TEXT_LEFT == 0x11 and pf.NK_TEXT_CENTERED == 0x12
    assert pf.NK_EDIT_FIELD == (pf.NK_EDIT_ALWAYS_INSERT_MODE
                                | pf.NK_EDIT_SELECTABLE | pf.NK_EDIT_CLIPBOARD)
    assert pf.NK_SYMBOL_TRIANGLE_UP == 7
    assert pf.NK_CHART_COLUMN == 1
    assert (pf.NK_TREE_TAB, pf.NK_POPUP_DYNAMIC, pf.NK_BUTTON_REPEATER) == (1, 1, 1)
    assert (pf.NK_HIDDEN, pf.NK_SHOWN) == (0, 1)


def test_get_key_name_uses_real_table():
    assert pf.get_key_name(pf.SDL_SCANCODE_SPACE) == "SPACE"
    assert pf.get_key_name(pf.SDL_SCANCODE_A) == "A"
    assert pf.get_key_name(9999) == "KEY_9999"
