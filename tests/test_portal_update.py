"""Incremental dirty-chunk portal-graph rebuild.

The reference rebuilds only dirty chunks' portals/links/components on
N_Update (ref: /root/reference/src/navigation/nav.c:2119-2206); a single
structure commit must touch at most the dirty chunk's neighbourhood, not
the whole map.
"""

import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    EntityFlags,
    FIELD_RES,
)
from permafrost_engine_tpu.nav import portals as pt


def _canon(graph: pt.PortalGraph):
    """Graph canonical form keyed by geometric portal identity."""
    def ident(p):
        return (p.chunk, p.side, p.lo, p.hi)

    portals = sorted(ident(p) for p in graph.portals)
    edges = {}
    for pid, links in graph.adj.items():
        for qid, w in links:
            edges[(ident(graph.portals[pid]),
                   ident(graph.portals[qid]))] = round(w, 3)
    return portals, edges


def _walled_cost(chunks_r, chunks_c, rng):
    """Open map with a few random wall segments (portals split per edge)."""
    h, w = chunks_r * FIELD_RES, chunks_c * FIELD_RES
    cost = np.ones((h, w), np.uint8)
    for _ in range(chunks_r * chunks_c // 2):
        r = int(rng.integers(0, h - 20))
        c = int(rng.integers(0, w - 20))
        if rng.random() < 0.5:
            cost[r:r + 2, c:c + 18] = COST_IMPASSABLE
        else:
            cost[r:r + 18, c:c + 2] = COST_IMPASSABLE
    return cost


def test_incremental_update_matches_fresh_build():
    """Oracle: updating after a cutout equals a from-scratch build."""
    rng = np.random.default_rng(7)
    cost = _walled_cost(4, 4, rng)
    graph = pt.build_portal_graph(cost, 4, 4)

    # stamp a structure into chunk (1, 2), overlapping its north border
    cost2 = cost.copy()
    r0 = 1 * FIELD_RES - 2
    c0 = 2 * FIELD_RES + 10
    cost2[r0:r0 + 8, c0:c0 + 8] = COST_IMPASSABLE
    dirty = {(0, 2), (1, 2)}

    upd, n = pt.update_portal_graph(graph, cost2, dirty, 4, 4)
    fresh = pt.build_portal_graph(cost2, 4, 4)
    up, ue = _canon(upd)
    fp, fe = _canon(fresh)
    assert up == fp, "portal sets diverge"
    assert set(ue) == set(fe), "edge sets diverge"
    for k in ue:
        assert abs(ue[k] - fe[k]) < 0.75, f"edge cost diverges at {k}"
    assert n <= 2 + 6   # dirty chunks + their orthogonal neighbours


def test_unstamp_restores_original_graph():
    rng = np.random.default_rng(11)
    cost = _walled_cost(4, 4, rng)
    graph = pt.build_portal_graph(cost, 4, 4)
    cost2 = cost.copy()
    cost2[40:48, 40:48] = COST_IMPASSABLE
    upd, _ = pt.update_portal_graph(graph, cost2, {(0, 0)}, 4, 4)
    back, _ = pt.update_portal_graph(upd, cost, {(0, 0)}, 4, 4)
    assert _canon(back)[0] == _canon(graph)[0]
    assert set(_canon(back)[1]) == set(_canon(graph)[1])


def test_commit_rebuilds_only_dirty_neighbourhood():
    """16x16-chunk map: one structure commit relinks <= the dirty chunk
    neighbourhood (here a mid-chunk stamp -> 1 dirty + 4 neighbours), not
    all 256 chunks."""
    cfg = EngineConfig(max_ents=16, chunks_r=16, chunks_c=16, num_layers=1,
                       max_flocks=4, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    from permafrost_engine_tpu.game.engine import Engine

    eng = Engine(cfg)
    eng.nav.graph(0)   # build the whole-map graph once
    assert eng.nav.stats["chunks_rebuilt"] == 0

    # building centred in the middle of chunk (8, 8)
    from permafrost_engine_tpu.core.config import NAV_TILE_SIZE
    x = (8 * FIELD_RES + FIELD_RES // 2) * float(NAV_TILE_SIZE)
    b = eng.spawn_batch(
        np.array([[x, x]], np.float32), radius=7.0,
        flags=int(EntityFlags.COLLISION | EntityFlags.BUILDING),
        max_speed=0.0)
    eng.set_structure_blocking(b[0], True)
    eng._commit_nav()
    assert 1 <= eng.nav.stats["chunks_rebuilt"] <= 5, \
        f"commit relinked {eng.nav.stats['chunks_rebuilt']} chunks"
    # the updated graph is still coherent: same as a fresh build
    fresh = pt.build_portal_graph(eng.nav.cost_base[0], 16, 16)
    assert _canon(eng.nav.graph(0))[0] == _canon(fresh)[0]
