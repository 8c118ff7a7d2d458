"""The pf scripting API surface: entities, orders, queries, sessions.

Modelled on the reference's script-driven test strategy (SURVEY §4):
everything goes through the `pf` module like a game script would.
"""

import numpy as np
import pytest

import permafrost_engine_tpu.script.pf as pf
from permafrost_engine_tpu.core.config import EngineConfig
from tests.test_engine_move import small_cfg


@pytest.fixture(autouse=True)
def fresh_ctx():
    pf.init(small_cfg())
    yield
    pf._context = None


def test_entity_spawn_move_query():
    e = pf.MovableEntity("unit.pfobj", "grunt", pos=(50.0, 0.0, 50.0),
                         speed=120.0)
    assert e.uid in pf.context().engine.uid_to_slot
    assert e.pos[0] == 50.0 and e.pos[2] == 50.0
    assert not e.moving
    e.move((150.0, 0.0, 50.0))
    assert e.moving
    pf.step(240)
    assert not e.moving
    assert abs(e.pos[0] - 150.0) < 8.0
    # events arrived through the bus
    got = []
    pf.register_event_handler(pf.EVENT_MOTION_END, got.append)
    e.move((60.0, 0.0, 50.0))
    pf.step(300)
    assert any(g["uid"] == e.uid for g in got)


def test_entity_tags_and_spatial_queries():
    a = pf.Entity("a.pfobj", "a", pos=(10.0, 0.0, 10.0))
    b = pf.Entity("b.pfobj", "b", pos=(14.0, 0.0, 10.0))
    c = pf.Entity("c.pfobj", "c", pos=(400.0, 0.0, 400.0))
    a.tags.add("hero")
    assert [e.uid for e in pf.entities_for_tag("hero")] == [a.uid]
    near = {e.uid for e in pf.ents_in_circle((10.0, 0.0, 10.0), 10.0)}
    assert near == {a.uid, b.uid}
    box = {e.uid for e in pf.ents_in_rect((0.0, 0.0), (20.0, 20.0))}
    assert box == {a.uid, b.uid}
    nearest = pf.nearest_ent((395.0, 0.0, 395.0))
    assert nearest.uid == c.uid


def test_factions_and_diplomacy():
    f0 = pf.add_faction("Humans", (255, 0, 0))
    f1 = pf.add_faction("Orcs", (0, 255, 0), controllable=False)
    facs = pf.get_factions_list()
    assert [f["name"] for f in facs] == ["Humans", "Orcs"]
    assert facs[1]["controllable"] is False
    pf.set_diplomacy_state(f0, f1, pf.DIPLOMACY_STATE_WAR)
    assert pf.get_diplomacy_state(f0, f1) == pf.DIPLOMACY_STATE_WAR
    assert pf.get_diplomacy_state(f1, f0) == pf.DIPLOMACY_STATE_WAR


def test_population_api():
    pf.add_faction("A")
    pf.PopulationContributorEntity("u.pfobj", "u", pos=(5.0, 0.0, 5.0),
                                   population_cost=3)
    pf.PopulationLimitContributorEntity("h.pfobj", "h", pos=(9.0, 0.0, 5.0),
                                        population_provided=12)
    assert pf.get_player_population() == 3
    assert pf.get_player_population_limit() == 12


def test_harvest_through_entities():
    pf.add_faction("A")
    tree = pf.ResourceEntity("tree.pfobj", "tree", pos=(140.0, 0.0, 100.0),
                             resource_name="Wood", resource_amount=40)
    store = pf.StorageSiteEntity("hut.pfobj", "hut", pos=(100.0, 0.0, 140.0))
    store.set_capacity("Wood", 100)
    w = pf.HarvesterEntity("w.pfobj", "w", pos=(100.0, 0.0, 100.0), speed=120.0)
    w.set_gather_speed("Wood", 5)
    w.set_max_carry("Wood", 10)
    pf.context().engine.economy_period = 3
    w.gather(tree)
    for _ in range(80):
        pf.step(6)
        if store.get_curr("Wood") >= 10:
            break
    assert store.get_curr("Wood") >= 10
    assert pf.get_resource_stored(0, "Wood") == store.get_curr("Wood")
    assert pf.get_resource_list() == ["Wood"]


def test_settings_api():
    assert pf.settings_get("pf.game.movement_hz") == 20
    pf.settings_set("pf.video.vsync", False)
    assert pf.settings_get("pf.video.vsync") is False
    pf.settings_create("pf.mygame.difficulty", 2)
    assert pf.settings_get("pf.mygame.difficulty") == 2


def test_camera_and_cursor_api():
    cam = pf.get_active_camera()
    cam.move_within_bounds_and_face((300.0, 300.0))
    hit = pf.map_pos_under_cursor()
    assert hit is not None and abs(hit[0] - 300.0) < 1.0
    pf.set_cursor_rts_mode(True)
    assert pf.get_cursor_rts_mode()


def test_region_class_and_events():
    pf.context().engine.economy_period = 3
    zone = pf.Region("zone", (200.0, 0.0, 200.0), radius=30.0)
    u = pf.MovableEntity("u.pfobj", "u", pos=(150.0, 0.0, 200.0), speed=120.0)
    u.move((200.0, 0.0, 200.0))
    pf.step(300)
    assert u.uid in zone.entities
    zone.delete()


def test_task_protocol():
    log = []

    class Pinger(pf.Task):
        def __run__(self):
            yield self.register("pinger")
            msg, sender = yield self.receive()
            log.append(msg)
            yield self.reply(sender, msg + 1)

    class Ponger(pf.Task):
        def __run__(self):
            tid = yield self.who_is("pinger")
            r = yield self.send(tid, 41)
            log.append(r)

    Pinger()
    Ponger()
    pf.flush_tasks()
    assert log == [41, 42]


def test_pickle_and_console():
    data = pf.pickle_object({"a": [1, 2, 3]})
    assert pf.unpickle_object(data) == {"a": [1, 2, 3]}
    out = pf.console_eval("1 + 1")
    assert out == "2"
    assert "get_ticks" in pf.console_eval("dir(pf)")


def test_session_roundtrip_via_pf(tmp_path):
    pf.context().basedir = str(tmp_path)
    e = pf.MovableEntity("u.pfobj", "u", pos=(77.0, 0.0, 88.0))
    assert pf.save_session("save.bin")
    old_engine = pf.context().engine
    assert pf.load_session("save.bin")
    assert pf.context().engine is not old_engine
    slot = pf.context().engine.uid_to_slot[e.uid]
    p = np.asarray(pf.context().engine.state.ents.pos)[slot]
    assert tuple(p) == (77.0, 88.0)


def test_map_load_string_and_tiles():
    from permafrost_engine_tpu.assets.pfmap import make_flat_map, write_pfmap
    m = make_flat_map(2, 2)
    m.pathable[40, 40] = False
    m.base_height[50, 50] = -3
    text = write_pfmap(m)
    assert pf.load_map_string(text)
    tile = pf.get_tile((1, 1), (8, 8))    # global tile (40, 40)
    assert tile["pathable"] is False
    from permafrost_engine_tpu.core.config import UNITS_PER_TILE
    assert pf.map_pos_over_water(
        (50.5 * UNITS_PER_TILE, 0.0, 50.5 * UNITS_PER_TILE))
    assert pf.map_pos_over_land((10.0, 0.0, 10.0))
    assert pf.map_height_at_point(
        (50.5 * UNITS_PER_TILE, 0.0, 50.5 * UNITS_PER_TILE)) < 0
    p = pf.map_nearest_pathable((40.2 * UNITS_PER_TILE, 0.0,
                                 40.2 * UNITS_PER_TILE))
    assert p is not None


def test_misc_surface():
    assert pf.get_version_string().endswith("tpu")
    assert pf.rand(10) in range(10)
    q = pf.multiply_quaternions((0, 0, 0, 1), (0, 0, 0, 1))
    assert q == (0, 0, 0, 1)
    assert pf.play_music("theme")
    assert pf.curr_music() == "theme"
    assert pf.play_global_effect("horn")
    pf.set_minimap_size(128)
    assert pf.get_minimap_size() == 128
    w = pf.Window("test", (10, 10, 200, 100))
    w.show()
    assert pf.get_active_window() == "test"
    pf.set_move_on_left_click()
    assert pf.context().click_modes.move


def test_map_slope_costs_and_cliffs():
    """Ground nav costs rise with slope; un-ramped cliffs are impassable;
    ramps connect height levels (ref: terrain cost into fields)."""
    from permafrost_engine_tpu.assets.pfmap import (
        compile_nav_costs, make_flat_map,
    )
    from permafrost_engine_tpu.core.config import COST_IMPASSABLE

    m = make_flat_map(2, 2)
    m.base_height[:, 32:] = 6          # sheer cliff at col 32
    m.tile_type[20:24, 31:33] = 0x3    # a ramp section bridging it
    cost, heights = compile_nav_costs(m)
    ground = cost[0]
    # away from the ramp the cliff boundary is impassable
    assert ground[10 * 2, 32 * 2] == COST_IMPASSABLE
    # the ramp section is passable with elevated cost (the slope burden
    # lands on the nav tiles adjacent to the seam: map col 31's east half)
    rv = ground[21 * 2, 31 * 2 + 1]
    assert rv != COST_IMPASSABLE and rv > 1
    # flat terrain costs 1
    assert ground[10 * 2, 10 * 2] == 1
    assert heights[10 * 2, 40 * 2] > heights[10 * 2, 10 * 2]


def test_ramp_heights_interpolate():
    """Ramp tiles slope between levels instead of sitting flat at base
    height (ref: M_Tile_HeightAtPos, src/map/tile.c:249; corner tables
    tile.c:126-179)."""
    import numpy as np
    from permafrost_engine_tpu.assets.pfmap import (
        HEIGHT_SCALE, make_flat_map, nav_heights)

    m = make_flat_map(1, 1)
    m.base_height[:, 16:] = 4          # plateau east of col 16
    # a RAMP_WE at (8, 15): low (base 0) on the west, raised on the east
    m.tile_type[8, 15] = 0x4
    m.ramp_height[8, 15] = 4
    h = nav_heights(m)
    # flat tiles unchanged
    assert h[16, 2] == 0.0 and h[16, 40] == 4.0
    # the ramp's two nav columns step up monotonically between the levels
    west, east = h[16, 30], h[16, 31]
    assert 0.0 < west < east < 4.0
    # world-unit heights follow through compile
    from permafrost_engine_tpu.assets.pfmap import compile_nav_costs
    cost, heights = compile_nav_costs(m)
    assert heights[16, 30] == west * HEIGHT_SCALE
    # the ramp is climbable for ground units (not a cliff)
    from permafrost_engine_tpu.core.config import COST_IMPASSABLE
    assert cost[0, 16, 30] != COST_IMPASSABLE
    assert cost[0, 16, 31] != COST_IMPASSABLE
    # the sheer cliff next to it is not
    assert cost[0, 30, 31] == COST_IMPASSABLE or cost[0, 30, 32] == COST_IMPASSABLE
