"""Formation movement: cell layout, assignment, units settle on cells."""

import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    MoveState,
    NAV_TILE_SIZE,
)
from permafrost_engine_tpu.game.engine import Engine
from permafrost_engine_tpu.game.formation import (
    FormationType,
    assign_cells,
    layout_cells,
)
from tests.test_engine_move import small_cfg


def test_layout_rank_vs_column_shape():
    cost = np.ones((128, 128), np.uint8)
    goal = np.array([256.0, 256.0])
    d = np.array([1.0, 0.0])
    rank = layout_cells(16, goal, d, FormationType.RANK, 4.0, cost)
    col = layout_cells(16, goal, d, FormationType.COLUMN, 4.0, cost)
    assert len(rank) >= 16 and len(col) >= 16
    # rank is wide across the perpendicular (z here), column is deep along x
    assert np.ptp(rank[:, 1]) > np.ptp(col[:, 1])
    assert np.ptp(col[:, 0]) > np.ptp(rank[:, 0])


def test_layout_avoids_blocked_tiles():
    cost = np.ones((128, 128), np.uint8)
    cost[60:68, :] = COST_IMPASSABLE
    goal = np.array([256.0, 62 * NAV_TILE_SIZE])  # goal row blocked
    cells = layout_cells(8, goal, np.array([0.0, 1.0]), FormationType.RANK,
                         4.0, cost)
    for p in cells:
        r, c = int(p[1] // NAV_TILE_SIZE), int(p[0] // NAV_TILE_SIZE)
        assert cost[r, c] != COST_IMPASSABLE


def test_assign_cells_permutation():
    rng = np.random.default_rng(0)
    units = rng.random((12, 2)).astype(np.float32) * 50
    cells = rng.random((15, 2)).astype(np.float32) * 50
    a = assign_cells(units, cells)
    assert (a >= 0).all()
    assert len(set(a.tolist())) == 12


def test_layout_avoids_occupied_tiles_and_wrong_islands():
    """Cells skip occupied tiles (parked blockers) and tiles off the goal's
    island (ref: formation.c occupancy + island fields, :450-980)."""
    cost = np.ones((128, 128), np.uint8)
    cost[:, 64:] = COST_IMPASSABLE        # east half is another world
    occ = np.zeros((128, 128), np.int32)
    occ[78:82, 28:36] = 1                 # a parked blob near the goal
    from permafrost_engine_tpu.ops.islands import label_islands
    import jax.numpy as jnp
    isl = np.asarray(label_islands(jnp.asarray(cost)))
    goal = np.array([32 * NAV_TILE_SIZE, 80 * NAV_TILE_SIZE])
    island = int(isl[80, 32])
    cells = layout_cells(24, goal, np.array([0.0, 1.0]), FormationType.RANK,
                         4.0, cost, occupancy=occ, islands=isl, island=island)
    assert len(cells) >= 24
    for p in cells:
        r, c = int(p[1] // NAV_TILE_SIZE), int(p[0] // NAV_TILE_SIZE)
        assert cost[r, c] != COST_IMPASSABLE
        assert occ[r, c] == 0, "cell placed on an occupied tile"
        assert isl[r, c] == island


def test_subformation_blocks_per_layer():
    """Mixed-footprint formations split into per-layer blocks stacked back
    from the goal (ref: subformations, formation.c)."""
    from permafrost_engine_tpu.core.config import EngineConfig

    cfg = EngineConfig(max_ents=64, chunks_r=2, chunks_c=2, num_layers=4,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    eng = Engine(cfg)
    rng = np.random.default_rng(2)
    small = eng.spawn_batch(
        (rng.random((8, 2)) * 30 + 60).astype(np.float32), radius=1.0,
        max_speed=60.0)
    big = eng.spawn_batch(
        (rng.random((4, 2)) * 30 + 100).astype(np.float32), radius=8.0,
        max_speed=60.0)
    goal = np.array([300.0, 300.0])
    assert eng.move_in_formation(small + big, tuple(goal), FormationType.RANK)
    cells = np.asarray(eng.state.ents.formation_cell)
    d = np.asarray([300.0, 300.0]) - np.asarray(
        eng.state.ents.pos)[[eng.uid_to_slot[u] for u in small]].mean(0)
    d = d / np.linalg.norm(d)
    proj_small = np.asarray(
        [cells[eng.uid_to_slot[u]] @ d for u in small])
    proj_big = np.asarray([cells[eng.uid_to_slot[u]] @ d for u in big])
    # the big block sits strictly behind the small block along the facing
    assert proj_big.max() < proj_small.min()
    # and the two layers got distinct flocks (per-layer fields)
    fl = np.asarray(eng.state.ents.flock)
    assert fl[eng.uid_to_slot[small[0]]] != fl[eng.uid_to_slot[big[0]]]


def test_formation_move_settles_on_cells():
    cfg = small_cfg()
    eng = Engine(cfg)
    rng = np.random.default_rng(1)
    pos = (rng.random((9, 2)) * 40 + 80).astype(np.float32)
    uids = eng.spawn_batch(pos, max_speed=80.0)
    ok = eng.move_in_formation(uids, (300.0, 300.0), FormationType.RANK)
    assert ok
    for _ in range(200):
        eng.step(6)
        if all(eng.movestate_of(u) == MoveState.ARRIVED for u in uids):
            break
    cells = np.asarray(eng.state.ents.formation_cell)
    dists = []
    for u in uids:
        s = eng.uid_to_slot[u]
        assert eng.movestate_of(u) == MoveState.ARRIVED, f"unit {u} stuck"
        dists.append(np.linalg.norm(eng.pos_of(u) - cells[s]))
    dists = np.asarray(dists)
    # most units on their exact cells; wedge-settled stragglers nearby
    # (the stuck-counter fallback, ref: arrival.h wedge counters)
    assert (dists < 6.0).sum() >= len(uids) - 2, dists
    assert (dists < 26.0).all(), dists


def test_formation_keep_force_holds_offsets():
    """The formation keep force pulls each unit toward its cell offset
    relative to the MOVING flock centroid, and is gated off for plain
    (non-formation) flocks (ref: movement.c:1524-2023)."""
    import jax.numpy as jnp

    from permafrost_engine_tpu.ops.boids import formation_keep_force

    # two units side by side, cells also side by side but the whole block
    # translated far away: keep force must point along each unit's OFFSET
    # error, not at the distant cells
    pos = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    vel = jnp.zeros((2, 2))
    flock = jnp.asarray([0, 0])
    # cells swapped relative to current offsets: left unit's cell is on
    # the right of the cell centroid and vice versa
    cell = jnp.asarray([[105.0, 0.0], [95.0, 0.0]])
    has = jnp.asarray([True, True])
    form_on = jnp.asarray([1, 0, 0, 0])
    f = np.asarray(formation_keep_force(pos, vel, flock, cell, has,
                                        form_on, 4))
    # centroid (5,0); cell centroid (100,0); targets: (10,0) and (0,0)
    assert f[0][0] > 0.1, "left unit should be pulled right to its slot"
    assert f[1][0] < -0.1, "right unit should be pulled left to its slot"

    form_off = jnp.asarray([0, 0, 0, 0])
    f0 = np.asarray(formation_keep_force(pos, vel, flock, cell, has,
                                         form_off, 4))
    assert np.allclose(f0, 0.0), "non-formation flocks must get no force"


def test_rank_column_holds_through_choke():
    """64 units in RANK march through a 6-tile choke and RE-FORM on the
    far side without dissolving: every unit settles near its cell and the
    block's spread stays bounded (ref: formation.c:354 cell fields +
    movement.c:1524-2023 formation forces)."""
    from permafrost_engine_tpu.core.config import EngineConfig

    cfg = EngineConfig(max_ents=128, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=32, los_slab_slots=32)
    cost = np.ones((1, cfg.field_h, cfg.field_w), np.uint8)
    # wall across the map at the chunk boundary, one 6-tile choke
    cost[0, 62:66, :] = COST_IMPASSABLE
    cost[0, 62:66, 61:67] = 1
    eng = Engine(cfg, cost_base=cost)

    rng = np.random.default_rng(5)
    pos = (rng.random((64, 2)) * np.array([200.0, 80.0])
           + np.array([150.0, 60.0])).astype(np.float32)
    uids = eng.spawn_batch(pos, max_speed=80.0)
    assert eng.move_in_formation(uids, (250.0, 420.0), FormationType.RANK)
    fid = int(np.asarray(eng.state.ents.flock)[eng.uid_to_slot[uids[0]]])
    assert int(np.asarray(eng.state.flocks.formation)[fid]) > 0

    for _ in range(400):
        eng.step(6)
        if all(eng.movestate_of(u) == MoveState.ARRIVED for u in uids):
            break
    slots = [eng.uid_to_slot[u] for u in uids]
    p = np.asarray(eng.state.ents.pos)[slots]
    cells = np.asarray(eng.state.ents.formation_cell)[slots]
    assert (p[:, 1] > 264.0).all(), "some units never crossed the choke"
    d = np.linalg.norm(p - cells, axis=1)
    # re-formed: most units on their cells, nobody far adrift
    assert float(np.median(d)) < 8.0, f"median cell error {np.median(d)}"
    assert (d < 30.0).all(), f"formation dissolved: {np.sort(d)[-5:]}"


def test_subformation_blocks_per_unit_type():
    """Same-layer units of different TYPES form separate blocks stacked
    along the facing, ordered by (formation_priority, type id) and each
    spaced by its own radius (ref: init_subformations + sort_by_type,
    formation.c:1405-1565)."""
    from permafrost_engine_tpu.core.config import EngineConfig

    cfg = EngineConfig(max_ents=64, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    eng = Engine(cfg)
    rng = np.random.default_rng(3)
    knights = eng.spawn_batch(
        (rng.random((6, 2)) * 30 + 60).astype(np.float32),
        max_speed=60.0, unit_type=1, formation_priority=0)
    mages = eng.spawn_batch(
        (rng.random((6, 2)) * 30 + 60).astype(np.float32),
        max_speed=60.0, unit_type=2, formation_priority=1)
    goal = np.array([300.0, 300.0])
    assert eng.move_in_formation(knights + mages, tuple(goal),
                                 FormationType.RANK)
    cells = np.asarray(eng.state.ents.formation_cell)
    pos = np.asarray(eng.state.ents.pos)
    d = goal - pos[[eng.uid_to_slot[u] for u in knights + mages]].mean(0)
    d = d / np.linalg.norm(d)
    proj_k = np.asarray([cells[eng.uid_to_slot[u]] @ d for u in knights])
    proj_m = np.asarray([cells[eng.uid_to_slot[u]] @ d for u in mages])
    # lower priority (knights) front block; mages strictly behind
    assert proj_m.max() < proj_k.min(), (proj_k, proj_m)
    # both types share ONE flock (same layer, shared fields)
    fl = np.asarray(eng.state.ents.flock)
    assert fl[eng.uid_to_slot[knights[0]]] == fl[eng.uid_to_slot[mages[0]]]


def test_mixed_type_formation_holds_clusters_through_march():
    """A Knight+Mage+Berzerker RANK formation keeps its type clusters
    separated along the march axis after arrival (the verdict's
    acceptance test for per-unit-type subformations)."""
    from permafrost_engine_tpu.core.config import EngineConfig

    cfg = EngineConfig(max_ents=64, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    eng = Engine(cfg)
    rng = np.random.default_rng(4)

    def squad(t):
        return eng.spawn_batch(
            (rng.random((5, 2)) * 25 + 60).astype(np.float32),
            max_speed=80.0, unit_type=t)

    knights, mages, berz = squad(1), squad(2), squad(3)
    goal = (320.0, 320.0)
    assert eng.move_in_formation(knights + mages + berz, goal,
                                 FormationType.RANK)
    for _ in range(120):
        eng.step(5)
        ms = np.asarray(eng.state.ents.movestate)
        if all(ms[eng.uid_to_slot[u]] == 0
               for u in knights + mages + berz):
            break
    pos = np.asarray(eng.state.ents.pos)
    d = np.asarray(goal) - pos[[eng.uid_to_slot[u]
                                for u in knights + mages + berz]].mean(0)
    # clusters: each type's centroid separated along the original march
    # axis, in type order, with small within-type spread
    axis = np.asarray([1.0, 1.0]) / np.sqrt(2)   # spawn->goal diagonal
    cents = []
    for grp in (knights, mages, berz):
        p = pos[[eng.uid_to_slot[u] for u in grp]]
        cents.append(float((p @ axis).mean()))
        spread = float((p @ axis).std())
        assert spread < 12.0, f"type cluster dissolved: spread {spread}"
    assert cents[0] > cents[1] > cents[2], \
        f"type blocks out of order along march axis: {cents}"
