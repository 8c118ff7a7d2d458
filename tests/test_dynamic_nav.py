"""Dynamic-world navigation: structure cutouts, incremental invalidation,
replanning, and per-layer flocks.

The reference recomputes dirty-chunk portals/edges/islands every movement
tick and invalidates cached fields at-chunk/through-chunk
(ref: /root/reference/src/navigation/nav.c:2119-2206, nav.c:655-693,
fieldcache.h:53-167). Here structure stamps accumulate host-side, commit at
frame boundaries, and flocks whose installed paths cross dirty chunks
replan.
"""

import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    EntityFlags,
    FIELD_RES,
    MoveState,
    NAV_TILE_SIZE,
)
from permafrost_engine_tpu.game.engine import Engine

BUILDING_FLAGS = int(EntityFlags.COLLISION | EntityFlags.BUILDING)


def cfg_2x2(num_layers=1):
    return EngineConfig(
        max_ents=128,
        chunks_r=2,
        chunks_c=2,
        num_layers=num_layers,
        max_flocks=8,
        max_projectiles=8,
        field_slab_slots=32,
        los_slab_slots=32,
    )


def spawn_wall(eng, z, x0, x1, spacing=12.0, radius=7.0):
    """A row of blocking buildings centred on z from x0 to x1."""
    xs = np.arange(x0, x1, spacing, dtype=np.float32)
    pos = np.stack([xs, np.full_like(xs, z)], 1)
    uids = eng.spawn_batch(
        pos, faction=0, radius=radius, flags=BUILDING_FLAGS, max_speed=0.0)
    for u in uids:
        eng.set_structure_blocking(u, True)
    return uids


def test_building_wall_forces_detour():
    """Placing buildings across a marching flock's path invalidates its
    cached fields and replans an A* detour through the remaining gap."""
    eng = Engine(cfg_2x2())
    squad = eng.spawn_batch(
        (np.array([[96.0, 80.0]], np.float32)
         + np.random.default_rng(3).random((6, 2)).astype(np.float32) * 24),
        max_speed=80.0)
    goal = (110.0, 430.0)
    assert eng.move(squad, goal)
    eng.step(12)   # start marching south

    # wall across the whole chunk boundary except a gap at the far east
    spawn_wall(eng, z=256.0, x0=8.0, x1=392.0)
    eng.step(6)    # commit happens at the frame boundary
    assert eng.nav.stats["invalidations"] > 0, "stale fields were not dropped"

    max_x = 0.0
    for _ in range(220):
        eng.step(6)
        ps = np.asarray(eng.state.ents.pos)[
            [eng.uid_to_slot[u] for u in squad]]
        max_x = max(max_x, float(ps[:, 0].max()))
        if all(eng.movestate_of(u) == MoveState.ARRIVED for u in squad):
            break
    for u in squad:
        assert eng.movestate_of(u) == MoveState.ARRIVED, f"unit {u} stuck"
        p = eng.pos_of(u)
        assert p[1] > 256.0, f"unit {u} never crossed the wall"
        assert np.linalg.norm(p - np.asarray(goal)) < 70.0
    assert max_x > 360.0, "units crossed the wall without detouring east"


def test_sealed_wall_retargets_then_reopens():
    """A full seal retargets orders to the near side (blocked-destination
    ladder); removing a building reopens the path and new orders cross."""
    eng = Engine(cfg_2x2())
    u = eng.spawn_batch(np.array([[96.0, 96.0]], np.float32), max_speed=80.0)
    wall = spawn_wall(eng, z=256.0, x0=4.0, x1=512.0)
    eng.step(6)

    assert eng.move(u, (96.0, 430.0))
    assert eng.nav.stats["retargeted"] == 1
    dest = np.asarray(eng.state.ents.dest)[eng.uid_to_slot[u[0]]]
    assert dest[1] < 256.0, "retarget ended up across the sealed wall"

    # demolish a stretch of wall -> islands merge -> a new order crosses
    for w in wall[-6:]:
        eng.despawn(w)
    eng.step(6)
    assert eng.move(u, (96.0, 430.0))
    assert eng.nav.stats["retargeted"] == 1, "reopened path still retargets"
    for _ in range(260):
        eng.step(6)
        if eng.movestate_of(u[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(u[0]) == MoveState.ARRIVED
    assert eng.pos_of(u[0])[1] > 256.0, "unit never crossed the reopened wall"


def test_replan_only_touches_crossing_flocks():
    """Through-chunk invalidation: a structure change in chunks a flock's
    path never touches must not replan it."""
    eng = Engine(cfg_2x2())
    a = eng.spawn_batch(np.array([[40.0, 40.0]], np.float32), max_speed=10.0)
    assert eng.move(a, (200.0, 40.0))      # path inside the NW chunk
    requests = eng.nav.stats["requests"]

    # structure wholly inside the SE chunk
    b = eng.spawn_batch(np.array([[400.0, 400.0]], np.float32),
                        radius=7.0, flags=BUILDING_FLAGS, max_speed=0.0)
    eng.set_structure_blocking(b[0], True)
    eng.step(6)
    assert eng.nav.stats["requests"] == requests, "unaffected flock replanned"


def test_path_exits_and_reenters_chunk():
    """A path that leaves a chunk and comes back (U around a wall that
    exists only in that chunk) gets a UNION field there: portal seeds carry
    their remaining-path cost, so one field serves both visits (round-1
    known cache limitation, now exact)."""
    cfg = EngineConfig(max_ents=32, chunks_r=1, chunks_c=2, num_layers=1,
                       max_flocks=4, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    cost = np.ones((1, 64, 128), np.uint8)
    cost[:, 31:33, 0:64] = COST_IMPASSABLE   # wall across the WEST chunk
    eng = Engine(cfg, cost_base=cost)
    u = eng.spawn_batch(np.array([[64.0, 60.0]], np.float32), max_speed=80.0)
    goal = (64.0, 200.0)       # same (west) chunk, other side of the wall
    assert eng.move(u, goal)
    # the west chunk appears twice on the path -> one union field
    keys = list(eng.nav.flow_cache.order)
    assert any(k[2][0] == "multi" for k in keys), f"no union field in {keys}"
    max_x = 0.0
    for _ in range(220):
        eng.step(6)
        max_x = max(max_x, float(eng.pos_of(u[0])[0]))
        if eng.movestate_of(u[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(u[0]) == MoveState.ARRIVED, "never arrived"
    p = eng.pos_of(u[0])
    assert p[1] > 132.0, "did not reach the far side of the wall"
    assert max_x > 256.0, "never detoured through the east chunk"
    assert np.linalg.norm(p - np.asarray(goal)) < 30.0


def test_los_fields_chain_across_path_chunks():
    """Every chunk on the installed path gets a LOS slice of the whole-map
    LOS field, so units latch direct-seek mid-path when they can see the
    goal (ref: field.c:435-537 chains LOS dest->src across chunks)."""
    from permafrost_engine_tpu.ops import velocity as vel_ops
    import jax.numpy as jnp

    eng = Engine(cfg_2x2())   # wide open 2x2 map: everything sees everything
    u = eng.spawn_batch(np.array([[96.0, 96.0]], np.float32), max_speed=80.0)
    assert eng.move(u, (96.0, 430.0))   # path spans the NW and SW chunks
    fid = int(np.asarray(eng.state.ents.flock)[eng.uid_to_slot[u[0]]])
    los_row = np.asarray(eng.state.flocks.los_slot)[fid]
    assert (los_row >= 0).sum() >= 2, "only the goal chunk got a LOS field"

    # the unit sits in the START chunk, two chunks from the goal, with a
    # clear line: the device-side LOS latch must fire there
    has_los = vel_ops.dest_los(
        eng.state.ents.pos, eng.state.ents.flock,
        eng.state.flocks.los_slot, eng.state.fields.los,
        chunks_r=eng.cfg.chunks_r, chunks_c=eng.cfg.chunks_c)
    assert bool(np.asarray(has_los)[eng.uid_to_slot[u[0]]])


def test_combat_chase_flows_around_wall():
    """MOVING_TO_TARGET routes through the faction's enemy-seek field:
    fighters separated from their target by a wall flow around it instead
    of wedging against it (ref: field.c:1209-1678 enemy-seek velocity)."""
    from permafrost_engine_tpu.core.config import DiplomacyState

    # one chunk, a wall with a south gap between fighter and target
    cost = np.ones((1, 64, 64), np.uint8)
    cost[0, 8:52, 32] = COST_IMPASSABLE   # vertical wall at x=128, gap below
    cfg = EngineConfig(max_ents=16, chunks_r=1, chunks_c=1, num_layers=1,
                       max_flocks=4, max_projectiles=8,
                       field_slab_slots=8, los_slab_slots=8)
    eng = Engine(cfg, cost_base=cost)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    a = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                        max_speed=60.0, vision_range=250.0, attack_range=5.0,
                        base_dmg=50.0, attack_period=1)
    b = eng.spawn_batch(np.array([[160.0, 100.0]], np.float32), faction=1,
                        base_dmg=0.0, hp=60.0)
    eng.seek_refresh_period = 6
    killed = False
    for _ in range(160):
        eng.step(6)
        if ("entity_death", {"uid": b[0]}) in eng.events:
            killed = True
            break
    assert killed, "fighter never reached the target behind the wall"
    # it went around: the fighter is on the target's side of the wall
    assert eng.pos_of(a[0])[0] > 128.0


def test_big_footprint_moves_with_clearance():
    """A 5x5-footprint unit routes through a corridor on ITS layer's
    dilated costs and never lets its center enter tiles impassable for its
    footprint (ref: 12 nav layers, nav.h:78-92; footprint dilation)."""
    cfg = EngineConfig(max_ents=8, chunks_r=1, chunks_c=1, num_layers=4,
                       max_flocks=4, max_projectiles=8,
                       field_slab_slots=8, los_slab_slots=8)
    cost = np.ones((4, 64, 64), np.uint8)
    # a 6-tile corridor (cols 29..34) through a wall band for 1x1 units;
    # the 5x5 layer sees it dilated down to the 2-tile center strip
    cost[:, 24:40, :29] = COST_IMPASSABLE
    cost[:, 24:40, 35:] = COST_IMPASSABLE
    cost[2, 24:40, 29:31] = COST_IMPASSABLE
    cost[2, 24:40, 33:35] = COST_IMPASSABLE
    eng = Engine(cfg, cost_base=cost)
    big = eng.spawn_batch(np.array([[126.0, 40.0]], np.float32),
                          radius=8.0, max_speed=60.0)
    assert int(np.asarray(eng.state.ents.layer)[eng.uid_to_slot[big[0]]]) == 2
    assert eng.move(big, (126.0, 220.0))
    for _ in range(160):
        eng.step(6)
        p = eng.pos_of(big[0])
        r = int(p[1] // NAV_TILE_SIZE)
        c = int(p[0] // NAV_TILE_SIZE)
        assert cost[2, r, c] != COST_IMPASSABLE, \
            f"5x5 unit center entered a blocked tile at {(r, c)}"
        if eng.movestate_of(big[0]) == MoveState.ARRIVED:
            break
    assert eng.movestate_of(big[0]) == MoveState.ARRIVED
    assert eng.pos_of(big[0])[1] > 160.0


def test_per_layer_flocks_split():
    """A mixed-footprint selection splits into per-layer flocks with
    per-layer fields (ref: split_into_layers, movement.c:771-787): the big
    unit's layer has the corridor sealed, so its flock retargets while the
    small unit's flock crosses."""
    cfg = cfg_2x2(num_layers=4)
    cost = np.ones((4, cfg.field_h, cfg.field_w), np.uint8)
    # wall with a corridor: open for 1x1 (layer 0), sealed for 5x5 (layer 2)
    cost[:, FIELD_RES - 1:FIELD_RES + 1, :] = COST_IMPASSABLE
    cost[0, FIELD_RES - 1:FIELD_RES + 1, 20:28] = 1
    eng = Engine(cfg, cost_base=cost)

    small = eng.spawn_batch(np.array([[96.0, 96.0]], np.float32),
                            radius=1.0, max_speed=80.0)
    big = eng.spawn_batch(np.array([[120.0, 96.0]], np.float32),
                          radius=8.0, max_speed=80.0)
    assert eng.move(small + big, (96.0, 430.0))

    slots = [eng.uid_to_slot[u] for u in small + big]
    flocks = np.asarray(eng.state.ents.flock)[slots]
    assert flocks[0] != flocks[1], "mixed footprints share a flock"
    layers = np.asarray(eng.state.flocks.layer)[flocks]
    assert layers[0] == 0 and layers[1] == 2
    # the big unit's goal retargeted to its own (northern) side
    assert eng.nav.stats["retargeted"] == 1
    dests = np.asarray(eng.state.ents.dest)[slots]
    assert dests[0][1] > 256.0, "small unit's goal should stay south"
    assert dests[1][1] < 256.0, "big unit's goal should retarget north"
