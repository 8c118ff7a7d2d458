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


def test_unreachable_goal_retargets_to_closest_reachable():
    """A goal on another island retargets to the closest tile on the
    unit's island — get-as-close-as-possible (ref: nav.c:1860-1935)."""
    cfg = small_cfg()
    cost = walled_cost(cfg)
    cost[:, FIELD_RES - 1:FIELD_RES + 1, :] = COST_IMPASSABLE  # seal the gap
    eng = Engine(cfg, cost_base=cost)
    uids = eng.spawn_batch(np.array([[400.0, 100.0]], np.float32),
                           max_speed=80.0)
    ok = eng.move(uids, (400.0, 400.0))
    assert ok
    assert eng.nav.stats["retargeted"] == 1
    # effective destination sits on the unit's side of the wall
    dest = np.asarray(eng.state.ents.dest)[eng.uid_to_slot[uids[0]]]
    wall_z = (FIELD_RES - 1) * NAV_TILE_SIZE
    assert dest[1] < wall_z
    # and the unit actually walks there and stops (north of the wall)
    for _ in range(120):
        eng.step(6)
        if eng.movestate_of(uids[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(uids[0]) == MoveState.ARRIVED
    p = eng.pos_of(uids[0])
    assert p[1] < wall_z
    assert np.linalg.norm(p - dest) < 60.0


def test_ring_arrival_packs_and_settles():
    """A large flock settles into packed rings around an occupied goal and
    stops oscillating (ref: src/game/arrival.h:49-120 ring-slot arrival):
    every unit gets its own ring slot at order time, so arrival is exact
    per unit."""
    cfg = EngineConfig(max_ents=256, chunks_r=1, chunks_c=1, num_layers=1,
                       max_flocks=4, max_projectiles=8,
                       field_slab_slots=8, los_slab_slots=8)
    eng = Engine(cfg)
    # an idle unit already parked on the goal
    eng.spawn_batch(np.array([[200.0, 200.0]], np.float32))
    rng = np.random.default_rng(7)
    pos = (np.array([40.0, 40.0]) + rng.random((100, 2)) * 40).astype(np.float32)
    uids = eng.spawn_batch(pos, max_speed=60.0)
    goal = np.array([200.0, 200.0])
    assert eng.move(uids, tuple(goal))

    # per-unit ring slots were assigned: unique destinations, ring-bounded
    slots = [eng.uid_to_slot[u] for u in uids]
    dests = np.asarray(eng.state.ents.dest)[slots]
    assert len(np.unique(dests.round(2), axis=0)) == len(uids)
    for _ in range(200):
        eng.step(6)
        ms = [eng.movestate_of(u) for u in uids]
        if all(m == MoveState.ARRIVED for m in ms):
            break
    arrived = sum(eng.movestate_of(u) == MoveState.ARRIVED for u in uids)
    assert arrived >= 95, f"only {arrived}/100 settled"
    p = np.asarray(eng.state.ents.pos)[slots]
    d = np.linalg.norm(p - goal, axis=1)
    # 100 units at spacing 6: ~6 rings -> everything within ~55 units
    assert float(np.median(d)) < 40.0
    assert float(d.max()) < 75.0
    # no oscillation: the settled crowd stays put for 2 more seconds
    eng.step(120)
    p2 = np.asarray(eng.state.ents.pos)[slots]
    assert float(np.linalg.norm(p2 - p, axis=1).max()) < 2.0


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

    # ground unit: a goal across the sea retargets to the near shore
    # (get-as-close-as-possible, ref: nav.c:1860-1935)
    g = eng.spawn_batch(np.array([west], np.float32), max_speed=80.0)
    assert eng.move(g, east)
    assert eng.nav.stats["retargeted"] == 1
    gdest = np.asarray(eng.state.ents.dest)[eng.uid_to_slot[g[0]]]
    assert gdest[0] < 20 * UNITS_PER_TILE, "retarget crossed the sea"

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
    # land is impassable for boats: a land goal retargets into the sea
    before = eng.nav.stats["retargeted"]
    assert eng.move(b, west)
    assert eng.nav.stats["retargeted"] == before + 1
    bdest = np.asarray(eng.state.ents.dest)[eng.uid_to_slot[b[0]]]
    assert 20 * UNITS_PER_TILE <= bdest[0] <= 44 * UNITS_PER_TILE

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


def test_dense_spawn_separates():
    """Contact resolution at saturation density: 48 units dumped into a
    12x12u box (far beyond tangent packing) must separate — no unit left
    interpenetrating a neighbour past 50% of the combined radius, and no
    deep stacking. Guards the FINE contact grid: the coarse 16u avoidance
    grid's cell cap drops most of such a crowd from its index, and before
    the 4u contact grid those dropped units were invisible to the pushout
    and contact projection (10k obstacle-map battles measured 42% of
    units interpenetrating at choke contact)."""
    eng = Engine(small_cfg())
    rng = np.random.default_rng(3)
    pos = (np.array([200.0, 200.0])
           + rng.random((48, 2)) * 12.0).astype(np.float32)
    eng.spawn_batch(pos, faction=0, max_speed=20.0)
    eng.step(600)  # 10 s: capped pushout needs time to unstack

    p = np.asarray(eng.state.ents.pos)[:48]
    rad = np.asarray(eng.state.ents.radius)[:48]
    d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    comb = (rad[:, None] + rad[None, :]) * 0.5   # bench's overlap bar
    assert not (d < comb).any(), (
        f"min pair distance {d.min():.2f} vs bar {comb.max():.2f}")
