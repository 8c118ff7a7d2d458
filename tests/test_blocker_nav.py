"""Live-unit blocker integration with the portal graph.

The reference maintains blocker-aware local islands per chunk and
recomputes blocked portal-edge states every movement tick; A* hops are
filtered by them, so a corridor plugged by PARKED UNITS (no structures)
forces a detour, and unplugging restores the short path
(ref: /root/reference/src/navigation/nav_data.h:142-158, nav.c:655-693,
a_star.c:212-258).

Map geometry (1x2 chunks, NAV_TILE_SIZE=4): 256x512 world units, wall on
the chunk border (x ~256) with a NORTH gap at rows 8..12 (y 32..52, the
short path for movers around y=80) and a SOUTH gap at rows 52..56
(y 208..228, the detour).
"""

import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    EntityFlags,
    MoveState,
    NAV_TILE_SIZE,
)
from permafrost_engine_tpu.game.engine import Engine

PARKED_FLAGS = int(EntityFlags.COLLISION | EntityFlags.MOVABLE)
BORDER_X = 64 * NAV_TILE_SIZE          # 256


def _plug_map():
    cost = np.ones((1, 64, 128), np.uint8)
    cost[0, :, 62:66] = COST_IMPASSABLE
    cost[0, 8:13, 62:66] = 1     # north gap (short path)
    cost[0, 52:57, 62:66] = 1    # south gap (detour)
    return cost


def _engine():
    cfg = EngineConfig(max_ents=64, chunks_r=1, chunks_c=2, num_layers=1,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    return Engine(cfg, cost_base=_plug_map())


def _tile_center(r, c):
    return ((c + 0.5) * NAV_TILE_SIZE, (r + 0.5) * NAV_TILE_SIZE)


def _park(eng, tiles):
    pos = np.array([_tile_center(r, c) for r, c in tiles], np.float32)
    return eng.spawn_batch(pos, faction=0, radius=1.5, flags=PARKED_FLAGS,
                           max_speed=30.0)


def _park_plug(eng):
    """Park stationary collidable units across the whole north-gap portal
    span (both border columns); they stamp blockers at the movement
    cadence."""
    tiles = [(r, c) for r in range(8, 13) for c in (63, 64)]
    return _park(eng, tiles)


START = (100.0, 80.0)
GOAL = (450.0, 80.0)


def test_parked_plug_forces_astar_detour():
    """A parked-unit plug (no structures) in the short corridor makes A*
    route the order through the south detour; removing the plug restores
    the short path."""
    eng = _engine()
    plug = _park_plug(eng)
    eng.step(6)    # movement ticks restamp blockers on device

    u = eng.spawn_batch(np.array([START], np.float32), max_speed=80.0)
    assert eng.move(u, GOAL)
    assert eng.nav.stats["blocked_edges"] > 0, "plug never blocked an edge"

    # the unit must physically take the detour: it dips toward the south
    # gap (y ~208+) before crossing the border
    max_y_west = 0.0
    for _ in range(300):
        eng.step(6)
        p = eng.pos_of(u[0])
        if p[0] < BORDER_X:
            max_y_west = max(max_y_west, float(p[1]))
        if eng.movestate_of(u[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(u[0]) == MoveState.ARRIVED, "never arrived"
    assert eng.pos_of(u[0])[0] > 370.0, "never reached the east side"
    assert max_y_west > 150.0, \
        f"unit crossed via the plugged north gap (max west y {max_y_west})"

    # unplug: parked units leave; the short path comes back for new orders
    for p in plug:
        eng.despawn(p)
    eng.step(6)
    u2 = eng.spawn_batch(np.array([START], np.float32), max_speed=80.0)
    assert eng.move(u2, GOAL)
    crossed_north = False
    for _ in range(300):
        eng.step(6)
        p = eng.pos_of(u2[0])
        if 200.0 < p[0] < 310.0 and p[1] < 65.0:
            crossed_north = True
        if eng.movestate_of(u2[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(u2[0]) == MoveState.ARRIVED
    assert crossed_north, "unplugged corridor was not used"


def test_blocker_flip_triggers_replan():
    """A plug appearing MID-MARCH flips the corridor's portal-edge state at
    the refresh cadence and the flock replans around it (through-chunk
    replan, ref: nav.c:655-693 recomputed each movement tick)."""
    eng = _engine()
    eng.seek_refresh_period = 6
    u = eng.spawn_batch(np.array([START], np.float32), max_speed=20.0)
    assert eng.move(u, GOAL)
    requests = eng.nav.stats["requests"]

    _park_plug(eng)
    # restamp + two pipelined refresh periods for the snapshot to land
    eng.step(30)
    assert eng.nav.stats["requests"] > requests, \
        "flock never replanned after the corridor plugged"
    assert eng.nav.stats["blocker_replans"] >= 1

    for _ in range(300):
        eng.step(6)
        if eng.movestate_of(u[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(u[0]) == MoveState.ARRIVED
    assert eng.pos_of(u[0])[0] > 370.0


def test_fully_sealed_by_blockers_falls_back_to_static_path():
    """When every corridor is plugged by parked units, the order still
    plans (blockers are transient — the reference falls back to the
    field-following path rather than failing)."""
    eng = _engine()
    _park_plug(eng)
    _park(eng, [(r, c) for r in range(52, 57) for c in (63, 64)])
    eng.step(6)
    u = eng.spawn_batch(np.array([START], np.float32), max_speed=80.0)
    assert eng.move(u, GOAL), \
        "transient full plug must not hard-fail the order"


def test_settled_crowd_does_not_churn_replans():
    """Edge flips confined to a flock's own GOAL chunk (its crowd parking)
    must not replan it — the blocker-replan storm that collapsed battle
    contact fps 30x. Flips elsewhere on the path still do."""
    eng = _engine()
    eng.seek_refresh_period = 6
    squad = eng.spawn_batch(
        np.array([[100.0 + 6 * i, 80.0] for i in range(6)], np.float32),
        max_speed=80.0)
    assert eng.move(squad, GOAL)
    fid = int(np.asarray(eng.state.ents.flock)[eng.uid_to_slot[squad[0]]])
    goal_chunk = next(iter(eng._goal_chunk_hood(fid)))

    # stub the edge-flip source: flips ONLY in the goal chunk -> no replan
    # even when the route WOULD change (the hood exclusion runs first)
    requests = eng.nav.stats["requests"]
    eng.nav.update_blockers = lambda blk: {goal_chunk}
    eng.nav.blockers_change_route = lambda fid, occ: True
    eng.step(30)
    assert eng.nav.stats["requests"] == requests, \
        "goal-chunk flips churned the flock into replanning"

    # flips on a mid-path chunk WITH a route change -> replan fires
    other = next(c for c in eng.nav.flock_chunks[fid] if c != goal_chunk)
    eng.nav.update_blockers = lambda blk: {other}
    eng.step(30)
    assert eng.nav.stats["requests"] > requests, \
        "mid-path flip never replanned"

    # ...and a mid-path flip whose detour status is UNCHANGED since the
    # plan does not replan again (edge flicker at battle contact)
    requests2 = eng.nav.stats["requests"]
    eng._blocker_replan_frame.clear()     # defeat the rate limit
    eng.step(60)
    assert eng.nav.stats["requests"] == requests2, \
        "same-detour-status flicker replanned again"
