"""End-to-end movement: squad pathfind around obstacles (BASELINE config #2).

Drives the full engine loop: spawn -> move order (portal A* + flow-field
install) -> jitted ticks -> arrival events.
"""

import numpy as np
import pytest

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    FIELD_RES,
    MoveState,
    NAV_TILE_SIZE,
)
from permafrost_engine_tpu.game.engine import Engine


def small_cfg():
    return EngineConfig(
        max_ents=64,
        chunks_r=2,
        chunks_c=2,
        num_layers=1,
        max_flocks=8,
        max_projectiles=32,
        field_slab_slots=16,
        los_slab_slots=16,
    )


def walled_cost(cfg):
    """Wall across the whole map at the chunk boundary except a gap on the
    left — forces pathing through a single portal."""
    cost = np.ones((cfg.num_layers, cfg.field_h, cfg.field_w), np.uint8)
    wall_r = FIELD_RES  # first row of the southern chunks
    cost[:, wall_r - 1:wall_r + 1, 8:] = COST_IMPASSABLE  # gap at cols 0..7
    return cost


@pytest.fixture(scope="module")
def arrived_engine():
    cfg = small_cfg()
    eng = Engine(cfg, cost_base=walled_cost(cfg))
    rng = np.random.default_rng(0)
    # squad in the north-east quadrant
    base = np.array([400.0, 100.0])
    pos = (base + rng.random((8, 2)) * 30).astype(np.float32)
    uids = eng.spawn_batch(pos, faction=0, max_speed=80.0)
    goal = (400.0, 400.0)  # south-east: must detour through the west gap
    ok = eng.move(uids, goal)
    assert ok, "path request failed"
    for _ in range(200):
        eng.step(6)
        ms = [eng.movestate_of(u) for u in uids]
        if all(m == MoveState.ARRIVED for m in ms):
            break
    return eng, uids, goal


def test_squad_arrives(arrived_engine):
    eng, uids, goal = arrived_engine
    for u in uids:
        assert eng.movestate_of(u) == MoveState.ARRIVED, f"unit {u} stuck"
        # arrival means the unit's flock reached the area; individual units
        # stop within the group's arrival radius of the goal
        d = np.linalg.norm(eng.pos_of(u) - np.asarray(goal))
        assert d < 60.0, f"unit {u} 'arrived' {d:.0f} units from goal"


def test_no_wall_clipping(arrived_engine):
    eng, uids, _ = arrived_engine
    # all units are south of the wall now; they must have crossed through
    # the gap (x < 8 tiles) — check they are actually south
    for u in uids:
        assert eng.pos_of(u)[1] > FIELD_RES * NAV_TILE_SIZE


def test_arrival_events_fired(arrived_engine):
    eng, uids, _ = arrived_engine
    done = {ev[1]["uid"] for ev in eng.events if ev[0] == "motion_end"}
    assert set(uids) <= done


def test_unreachable_goal_fails():
    cfg = small_cfg()
    cost = walled_cost(cfg)
    cost[:, FIELD_RES - 1:FIELD_RES + 1, :] = COST_IMPASSABLE  # seal the gap
    eng = Engine(cfg, cost_base=cost)
    uids = eng.spawn_batch(np.array([[400.0, 100.0]], np.float32))
    ok = eng.move(uids, (400.0, 400.0))
    assert not ok


def test_stationary_until_ordered():
    cfg = small_cfg()
    eng = Engine(cfg, cost_base=walled_cost(cfg))
    uids = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32))
    p0 = eng.pos_of(uids[0]).copy()
    eng.step(30)
    np.testing.assert_allclose(eng.pos_of(uids[0]), p0)


def test_water_and_air_domains():
    """Water units traverse only water; air ignores terrain; ground units
    refuse water-locked goals (ref: 12 nav layers, nav.h:78-92)."""
    from permafrost_engine_tpu.assets.pfmap import make_flat_map
    from permafrost_engine_tpu.core.config import (
        NavDomain, UNITS_PER_TILE, EntityFlags,
    )

    cfg = EngineConfig(max_ents=16, chunks_r=2, chunks_c=2, num_layers=12,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    m = make_flat_map(2, 2)
    m.base_height[:, 20:44] = -4       # a sea strip down the middle
    eng = Engine(cfg)
    eng.load_map_data(m)

    west = (10 * UNITS_PER_TILE, 32 * UNITS_PER_TILE)
    east = (50 * UNITS_PER_TILE, 32 * UNITS_PER_TILE)
    sea = (32 * UNITS_PER_TILE, 32 * UNITS_PER_TILE)

    # ground unit: a goal across the sea is unreachable
    g = eng.spawn_batch(np.array([west], np.float32), max_speed=80.0)
    assert not eng.move(g, east)

    # boat: starts in the sea, can move along it but not onto land
    b = eng.spawn_batch(np.array([sea], np.float32), max_speed=80.0,
                        domain=NavDomain.WATER,
                        flags=int(EntityFlags.COLLISION | EntityFlags.MOVABLE
                                  | EntityFlags.WATER))
    sea2 = (32 * UNITS_PER_TILE, 50 * UNITS_PER_TILE)
    assert eng.move(b, sea2)
    for _ in range(60):
        eng.step(6)
        if eng.movestate_of(b[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(b[0]) == MoveState.ARRIVED
    assert np.linalg.norm(eng.pos_of(b[0]) - np.asarray(sea2)) < 12.0
    assert not eng.move(b, west)   # land is impassable for boats

    # air unit: crosses the sea freely
    a = eng.spawn_batch(np.array([west], np.float32), max_speed=80.0,
                        domain=NavDomain.AIR,
                        flags=int(EntityFlags.MOVABLE | EntityFlags.AIR))
    assert eng.move(a, east)
    for _ in range(80):
        eng.step(6)
        if eng.movestate_of(a[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(a[0]) == MoveState.ARRIVED
    assert np.linalg.norm(eng.pos_of(a[0]) - np.asarray(east)) < 12.0
