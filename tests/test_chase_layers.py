"""Per-layer combat-chase fields.

The reference builds enemy-seek fields per nav layer
(ref: /root/reference/src/navigation/field.c:1209-1678); a 3x3-footprint
or water chaser must path around a wall to its target via a field
integrated on ITS layer's costs, not straight-line into the wall.
"""

import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    DiplomacyState,
    EngineConfig,
    NavDomain,
)
from permafrost_engine_tpu.game.engine import Engine

WALL_X = 32 * 4.0    # vertical wall at tile col 32, gap at the south end


def _engine(num_layers=8):
    # one chunk, wall on every layer between fighter and target; passage
    # only through the south gap (rows 52..63)
    cost = np.ones((num_layers, 64, 64), np.uint8)
    cost[:, 0:52, 32] = COST_IMPASSABLE
    cfg = EngineConfig(max_ents=16, chunks_r=1, chunks_c=1,
                       num_layers=num_layers, max_flocks=4,
                       max_projectiles=8, field_slab_slots=8,
                       los_slab_slots=8)
    eng = Engine(cfg, cost_base=cost)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    eng.seek_refresh_period = 6
    return eng


def _run_chase(eng, fighter, target, expect_layer):
    slot = eng.uid_to_slot[fighter]
    assert int(np.asarray(eng.state.ents.layer)[slot]) == expect_layer
    killed = False
    for _ in range(200):
        eng.step(6)
        if ("entity_death", {"uid": target}) in eng.events:
            killed = True
            break
    assert killed, \
        f"layer-{expect_layer} chaser never reached its target"
    # it went around, not through: the fighter is past the wall
    assert eng.pos_of(fighter)[0] > WALL_X
    # and a chase field was built on ITS layer, not layer 0 only
    cs = np.asarray(eng.state.factions.chase_slot)
    assert cs[0, expect_layer] >= 0, "no chase field on the chaser's layer"


def test_big_footprint_chaser_routes_around_wall():
    eng = _engine()
    a = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                        radius=4.0, max_speed=60.0, vision_range=250.0,
                        attack_range=8.0, base_dmg=50.0, attack_period=1)
    b = eng.spawn_batch(np.array([[160.0, 100.0]], np.float32), faction=1,
                        base_dmg=0.0, hp=60.0)
    _run_chase(eng, a[0], b[0], expect_layer=1)   # 3x3 footprint


def test_water_chaser_routes_around_wall():
    eng = _engine()
    a = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                        domain=NavDomain.WATER, max_speed=60.0,
                        vision_range=250.0, attack_range=8.0,
                        base_dmg=50.0, attack_period=1)
    b = eng.spawn_batch(np.array([[160.0, 100.0]], np.float32), faction=1,
                        domain=NavDomain.WATER, base_dmg=0.0, hp=60.0)
    _run_chase(eng, a[0], b[0], expect_layer=4)   # water 1x1


def test_empty_layer_frees_chase_slot():
    """When a layer's last unit dies, its chase slot is released."""
    eng = _engine()
    a = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                        radius=4.0, max_speed=60.0, vision_range=250.0,
                        attack_range=8.0, base_dmg=50.0, attack_period=1)
    b = eng.spawn_batch(np.array([[160.0, 100.0]], np.float32), faction=1,
                        base_dmg=0.0, hp=60.0)
    for _ in range(200):
        eng.step(6)
        if ("entity_death", {"uid": b[0]}) in eng.events:
            break
    eng.step(120)   # corpse decays (1 Hz) + pipelined refresh cadences pass
    cs = np.asarray(eng.state.factions.chase_slot)
    assert cs[1].max() < 0, "dead faction's layers kept chase slots"
    assert all(k[0] != 1 for k in eng._chase_gslot), \
        f"chase slots leaked: {eng._chase_gslot}"
