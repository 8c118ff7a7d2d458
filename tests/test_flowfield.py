"""Flow-field kernels vs a NumPy Dijkstra oracle.

The reference's integration field is exact Dijkstra over the 8-neighbour
octile stencil (ref: src/navigation/field.c:539-566); the TPU kernel's
min-plus relaxation must converge to the same fixed point.
"""

import heapq

import jax.numpy as jnp
import numpy as np
import pytest

from permafrost_engine_tpu.core.config import COST_IMPASSABLE, FIELD_RES, INF_COST
from permafrost_engine_tpu.ops import flowfield as ff

SQRT2 = np.sqrt(2.0)


def dijkstra_oracle(cost: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Exact Dijkstra with octile costs and no diagonal corner-cutting."""
    h, w = cost.shape
    passable = cost != COST_IMPASSABLE
    dist = np.full((h, w), np.inf)
    pq = []
    for r, c in zip(*np.nonzero(seeds & passable)):
        dist[r, c] = 0.0
        heapq.heappush(pq, (0.0, r, c))
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for dr, dc in offs:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w) or not passable[nr, nc]:
                continue
            if dr != 0 and dc != 0:
                if not (passable[r + dr, c] and passable[r, c + dc]):
                    continue
            step = float(cost[nr, nc]) * (SQRT2 if dr and dc else 1.0)
            nd = d + step
            if nd < dist[nr, nc] - 1e-9:
                dist[nr, nc] = nd
                heapq.heappush(pq, (nd, nr, nc))
    return dist


def random_cost(rng, h=FIELD_RES, w=FIELD_RES, p_block=0.2, max_cost=4):
    cost = rng.integers(1, max_cost + 1, size=(h, w)).astype(np.uint8)
    block = rng.random((h, w)) < p_block
    cost[block] = COST_IMPASSABLE
    return cost


def assert_matches_oracle(cost, seeds):
    integ = np.asarray(ff.integrate(jnp.asarray(cost), jnp.asarray(seeds)))
    got = np.where(integ >= INF_COST / 2, np.inf, integ)
    np.testing.assert_allclose(got, dijkstra_oracle(cost, seeds), rtol=1e-5, atol=1e-4)


def test_integrate_open_field():
    h = w = 32
    cost = np.ones((h, w), np.uint8)
    seeds = np.zeros((h, w), bool)
    seeds[0, 0] = True
    assert_matches_oracle(cost, seeds)


def test_integrate_with_walls():
    rng = np.random.default_rng(0)
    cost = np.ones((FIELD_RES, FIELD_RES), np.uint8)
    cost[32, 10:60] = COST_IMPASSABLE  # wall with a gap at the left
    seeds = np.zeros_like(cost, bool)
    seeds[60, 40] = True
    assert_matches_oracle(cost, seeds)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_integrate_random(seed):
    rng = np.random.default_rng(seed)
    cost = random_cost(rng)
    seeds = np.zeros_like(cost, bool)
    r, c = rng.integers(0, FIELD_RES, 2)
    cost[r, c] = 1
    seeds[r, c] = True
    assert_matches_oracle(cost, seeds)


def test_integrate_batched():
    rng = np.random.default_rng(7)
    K = 4
    costs = np.stack([random_cost(rng, 32, 32) for _ in range(K)])
    seeds = np.zeros_like(costs, bool)
    for k in range(K):
        r, c = rng.integers(0, 32, 2)
        costs[k, r, c] = 1
        seeds[k, r, c] = True
    integ = np.asarray(ff.integrate(jnp.asarray(costs), jnp.asarray(seeds)))
    for k in range(K):
        got = np.where(integ[k] >= INF_COST / 2, np.inf, integ[k])
        np.testing.assert_allclose(
            got, dijkstra_oracle(costs[k], seeds[k]), rtol=1e-5, atol=1e-4
        )


def test_flow_dirs_descend():
    """Following flow directions from any reachable tile must reach a seed
    in finitely many steps with strictly decreasing integration cost."""
    rng = np.random.default_rng(11)
    cost = random_cost(rng, 32, 32, p_block=0.15)
    seeds = np.zeros_like(cost, bool)
    cost[5, 5] = 1
    seeds[5, 5] = True
    integ = ff.integrate(jnp.asarray(cost), jnp.asarray(seeds))
    dirs = np.asarray(ff.flow_dirs(integ, jnp.asarray(cost)))
    integ = np.asarray(integ)
    from permafrost_engine_tpu.core.config import FLOW_DIR_OFFSETS

    reachable = (integ < INF_COST / 2) & (integ > 0)
    for r, c in zip(*np.nonzero(reachable)):
        code = dirs[r, c]
        assert code != 0, f"reachable tile ({r},{c}) has no flow dir"
        dr, dc = FLOW_DIR_OFFSETS[code]
        nr, nc = r + dr, c + dc
        assert integ[nr, nc] < integ[r, c]

    # seeds and unreachable tiles have no direction
    assert dirs[5, 5] == 0
    unreachable = integ >= INF_COST / 2
    assert (dirs[unreachable] == 0).all()


def test_los_open_field():
    h = w = 32
    passable = np.ones((h, w), bool)
    los = np.asarray(ff.los_field(jnp.asarray(passable), 16, 16))
    assert los.all()


def test_los_wall_shadow():
    h = w = 32
    passable = np.ones((h, w), bool)
    passable[16, 8:24] = False  # horizontal wall
    los = np.asarray(ff.los_field(jnp.asarray(passable), 4, 16))
    # goal above the wall: directly below the wall centre is shadowed
    assert los[4, 16] == 1
    assert los[10, 16] == 1  # above wall, visible
    assert los[20, 16] == 0  # below wall centre, shadowed
    assert los[16, 12] == 0  # the wall itself


def test_los_closed_form_matches_iterative_oracle():
    """los_field (closed-form quadrant decomposition) must be BIT-IDENTICAL
    to los_field_iter (the direct transcription of the reference recurrence,
    ref: src/navigation/field.c:435-537) — random densities, maze corridors,
    corner goals, impassable goals, batched per-element goals."""
    rng = np.random.default_rng(3)
    for _ in range(8):
        h = int(rng.choice([16, 33, 64]))
        w = int(rng.choice([16, 33, 64]))
        p = rng.random((h, w)) > rng.uniform(0.0, 0.5)
        gr, gc = int(rng.integers(0, h)), int(rng.integers(0, w))
        a = np.asarray(ff.los_field_iter(
            jnp.asarray(p), gr, gc, max_iters=2 * max(h, w)))
        b = np.asarray(ff.los_field(jnp.asarray(p), gr, gc))
        np.testing.assert_array_equal(a, b)

    # maze corridors (long thin shadows stress the straight-run tables)
    p = np.ones((64, 64), bool)
    for _ in range(25):
        r, c = rng.integers(0, 64, 2)
        n = int(rng.integers(5, 30))
        if rng.random() < 0.5:
            p[r, c:c + n] = False
        else:
            p[r:r + n, c] = False
    p[40, 40] = True
    a = np.asarray(ff.los_field_iter(jnp.asarray(p), 40, 40, max_iters=128))
    b = np.asarray(ff.los_field(jnp.asarray(p), 40, 40))
    np.testing.assert_array_equal(a, b)

    # corner goals on an open field
    for gr, gc in [(0, 0), (63, 63), (0, 63)]:
        p = np.ones((64, 64), bool)
        a = np.asarray(ff.los_field_iter(jnp.asarray(p), gr, gc,
                                         max_iters=128))
        b = np.asarray(ff.los_field(jnp.asarray(p), gr, gc))
        np.testing.assert_array_equal(a, b)

    # impassable goal -> no tile has LOS
    p = np.ones((32, 32), bool)
    p[5, 5] = False
    assert np.asarray(ff.los_field(jnp.asarray(p), 5, 5)).sum() == 0

    # batched with per-element goals (the install path's shape)
    p = rng.random((4, 64, 64)) > 0.25
    grs = jnp.asarray(rng.integers(0, 64, 4))
    gcs = jnp.asarray(rng.integers(0, 64, 4))
    a = np.asarray(ff.los_field_iter(jnp.asarray(p), grs, gcs,
                                     max_iters=128))
    b = np.asarray(ff.los_field(jnp.asarray(p), grs, gcs))
    np.testing.assert_array_equal(a, b)


def test_dir_code_to_vec():
    vecs = np.asarray(ff.dir_code_to_vec(jnp.arange(9, dtype=jnp.uint8)))
    assert np.allclose(vecs[0], 0)
    norms = np.linalg.norm(vecs[1:], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)
    # N (code 2) points -z, E (code 5) points +x
    np.testing.assert_allclose(vecs[2], [0, -1], atol=1e-6)
    np.testing.assert_allclose(vecs[5], [1, 0], atol=1e-6)


def test_pallas_kernel_matches_xla():
    """The VMEM-resident Pallas integration (interpreter mode on CPU) must
    match the XLA implementation exactly."""
    from permafrost_engine_tpu.ops.flowfield_pallas import integrate_pallas

    rng = np.random.default_rng(21)
    K = 3
    costs = np.stack([random_cost(rng, 64, 64, p_block=0.2) for _ in range(K)])
    seeds = np.zeros_like(costs, bool)
    for k in range(K):
        r, c = rng.integers(0, 64, 2)
        costs[k, r, c] = 1
        seeds[k, r, c] = True
    ref = np.asarray(ff.integrate(jnp.asarray(costs), jnp.asarray(seeds)))
    got = np.asarray(integrate_pallas(jnp.asarray(costs), jnp.asarray(seeds),
                                      interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_island_labels():
    """Connected components with the pathing connectivity rule
    (ref: n_visit_island nav.c:856; reject at nav.c:1806)."""
    from permafrost_engine_tpu.ops.islands import label_islands

    cost = np.ones((32, 32), np.uint8)
    cost[:, 16] = COST_IMPASSABLE          # full vertical wall
    cost[10, 10] = COST_IMPASSABLE
    lab = np.asarray(label_islands(jnp.asarray(cost)))
    assert lab[0, 0] >= 0 and lab[0, 20] >= 0
    assert lab[0, 0] != lab[0, 20]          # separated by the wall
    assert lab[0, 0] == lab[31, 15]         # same west side
    assert lab[0, 20] == lab[31, 31]        # same east side
    assert lab[10, 10] == -1                # impassable

    # diagonal-only touch does NOT connect (corner-cutting rule)
    cost2 = np.full((8, 8), COST_IMPASSABLE, np.uint8)
    cost2[0:4, 0:4] = 1
    cost2[4:8, 4:8] = 1
    lab2 = np.asarray(label_islands(jnp.asarray(cost2)))
    assert lab2[0, 0] != lab2[7, 7]


def test_island_mismatch_retargets_before_field_build():
    """Cross-island goals retarget on the host island map before any A* or
    field build toward the unreachable side (ref: reject at nav.c:1806,
    ladder at nav.c:1860-1935)."""
    from permafrost_engine_tpu.game.engine import Engine
    from tests.test_engine_move import small_cfg, walled_cost

    cfg = small_cfg()
    cost = walled_cost(cfg)
    cost[:, FIELD_RES - 1:FIELD_RES + 1, :] = COST_IMPASSABLE  # seal
    eng = Engine(cfg, cost_base=cost)
    import numpy as _np
    u = eng.spawn_batch(_np.array([[100.0, 100.0]], _np.float32))
    assert eng.move(u, (400.0, 400.0))
    assert eng.nav.stats["retargeted"] == 1
    # every installed field belongs to the unit's (northern) chunks: the
    # southern island never got integrated
    for layer, chunk, _sig in eng.nav.flow_cache.order:
        assert chunk[0] == 0, "built a field on the unreachable island"
