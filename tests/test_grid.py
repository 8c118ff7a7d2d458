"""Spatial grid vs brute-force neighbour oracles."""

import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import SPATIAL_CELL_SIZE
from permafrost_engine_tpu.ops import grid as g


def make_world(rng, n=200, world=160.0, n_dead=20):
    pos = rng.random((n, 2)).astype(np.float32) * world
    alive = np.ones(n, bool)
    alive[rng.choice(n, n_dead, replace=False)] = False
    cells = int(np.ceil(world / SPATIAL_CELL_SIZE))
    return pos, alive, cells


def test_build_grid_contains_all_alive():
    rng = np.random.default_rng(0)
    pos, alive, cells = make_world(rng)
    grid = g.build_grid(jnp.asarray(pos), jnp.asarray(alive),
                        cells_r=cells, cells_c=cells, cap=32)
    buckets = np.asarray(grid.buckets)
    indexed = buckets[buckets >= 0]
    assert sorted(indexed) == sorted(np.nonzero(alive)[0])
    # every indexed entity is in its own cell's bucket
    cell_of = np.asarray(grid.cell_of)
    for slot in indexed:
        assert slot in buckets[cell_of[slot]]


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(1)
    pos, alive, cells = make_world(rng, n=300)
    grid = g.build_grid(jnp.asarray(pos), jnp.asarray(alive),
                        cells_r=cells, cells_c=cells, cap=64)
    k, window = 8, 5
    slots = np.arange(pos.shape[0], dtype=np.int32)
    idx, dist, valid, _npos = g.knn_query(
        grid, jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(slots),
        k=k, window=window)
    idx, dist, valid = np.asarray(idx), np.asarray(dist), np.asarray(valid)

    # oracle: brute force within the window's guaranteed coverage radius
    # (window=5 over 16u cells guarantees everything within 2 cells = 32u)
    guaranteed = 2 * SPATIAL_CELL_SIZE
    for q in range(0, 300, 17):
        if not alive[q]:
            continue
        d = np.linalg.norm(pos - pos[q], axis=1)
        d[~alive] = np.inf
        d[q] = np.inf
        want = np.sort(d[d < guaranteed])[:k]
        got = dist[q][valid[q]]
        got_within = got[got < guaranteed]
        np.testing.assert_allclose(np.sort(got_within), want, rtol=1e-5)
        # returned indices are real, alive, and not self
        for j, v in zip(idx[q], valid[q]):
            if v:
                assert j != q and alive[j]


def test_knn_dead_entities_never_returned():
    rng = np.random.default_rng(2)
    pos, alive, cells = make_world(rng, n=100, n_dead=50)
    grid = g.build_grid(jnp.asarray(pos), jnp.asarray(alive),
                        cells_r=cells, cells_c=cells, cap=32)
    idx, dist, valid, _npos = g.knn_query(
        grid, jnp.asarray(pos), jnp.asarray(pos),
        jnp.asarray(np.arange(100, dtype=np.int32)), k=8)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert all(alive[j] for j in idx[valid])


def test_nearest_match_enemy_only():
    rng = np.random.default_rng(3)
    n = 500
    pos = rng.random((n, 2)).astype(np.float32) * 1000
    alive = rng.random(n) > 0.1
    faction = rng.integers(0, 3, n).astype(np.int32)
    # diplomacy: faction 0 vs 1 at war; 2 neutral with everyone
    war = np.zeros((3, 3), bool)
    war[0, 1] = war[1, 0] = True

    idx, dist = g.nearest_match(
        jnp.asarray(pos), jnp.asarray(alive),
        jnp.asarray(pos), jnp.asarray(alive),
        (jnp.asarray(faction), jnp.asarray(war), jnp.asarray(faction)),
        block=128,
    )
    idx, dist = np.asarray(idx), np.asarray(dist)
    for q in range(0, n, 23):
        if not alive[q]:
            assert idx[q] == -1
            continue
        enemies = alive & war[faction[q]][faction]
        if not enemies.any():
            assert idx[q] == -1
            continue
        d = np.linalg.norm(pos - pos[q], axis=1)
        d[~enemies] = np.inf
        assert idx[q] == np.argmin(d)
        np.testing.assert_allclose(dist[q], d.min(), rtol=1e-5)


def test_central_block_cols_selects_centre_cells():
    from permafrost_engine_tpu.ops.grid import central_block_cols
    cap = 3
    cols = central_block_cols(5, 3, cap)
    assert len(cols) == 9 * cap
    # selected blocks are exactly the centre 3x3 of the 5x5 window
    blocks = sorted(set(int(c) // cap for c in cols))
    expect = sorted(dr * 5 + dc for dr in (1, 2, 3) for dc in (1, 2, 3))
    assert blocks == expect
    # each block contributes its full bucket, in order
    for b in expect:
        seg = [c for c in cols if c // cap == b]
        assert list(seg) == list(range(b * cap, (b + 1) * cap))


def test_build_grid_pair_matches_separate_builds():
    """One composite-key sort must index the same entity SETS per cell as
    two independent builds (bucket order may differ; overflow drop order
    is allowed to differ, so caps here are high enough not to overflow)."""
    rng = np.random.default_rng(7)
    pos, alive, cells = make_world(rng, n=400, world=160.0)
    fine_cells = int(np.ceil(160.0 / 4.0))
    pay = rng.random((400, 3)).astype(np.float32)
    fpay = rng.random((400, 1)).astype(np.float32)
    cg, fg = g.build_grid_pair(
        jnp.asarray(pos), jnp.asarray(alive),
        cells_r=cells, cells_c=cells, cap=64, payload=jnp.asarray(pay),
        fine_r=fine_cells, fine_c=fine_cells, fine_cap=16,
        fine_payload=jnp.asarray(fpay), fine_cell_size=4.0)
    ref_c = g.build_grid(jnp.asarray(pos), jnp.asarray(alive),
                         cells_r=cells, cells_c=cells, cap=64,
                         payload=jnp.asarray(pay))
    ref_f = g.build_grid(jnp.asarray(pos), jnp.asarray(alive),
                         cells_r=fine_cells, cells_c=fine_cells, cap=16,
                         payload=jnp.asarray(fpay), cell_size=4.0)

    for got, ref in ((cg, ref_c), (fg, ref_f)):
        gb, rb = np.asarray(got.buckets), np.asarray(ref.buckets)
        assert gb.shape == rb.shape
        for c in range(gb.shape[0]):
            assert set(gb[c][gb[c] >= 0]) == set(rb[c][rb[c] >= 0])
        # positions/payload ride with the right slots
        gx = np.asarray(got.bucket_xy)
        gp = np.asarray(got.bucket_payload)
        for c in range(gb.shape[0]):
            for j in range(gb.shape[1]):
                s = gb[c, j]
                if s >= 0:
                    assert np.allclose(gx[c, j], pos[s])
                    ref_pay = pay if got is cg else fpay
                    assert np.allclose(gp[c, j], ref_pay[s])
        assert np.array_equal(np.asarray(got.cell_of), np.asarray(ref.cell_of))


def test_build_grid_pair_overflow_counts():
    """Overflowing cells keep exactly `cap` entries (drop order may differ
    from build_grid's slot-major order)."""
    # 40 entities piled into one 4u fine cell / one 16u coarse cell
    pos = np.full((40, 2), 2.0, np.float32)
    alive = np.ones(40, bool)
    cg, fg = g.build_grid_pair(
        jnp.asarray(pos), jnp.asarray(alive),
        cells_r=4, cells_c=4, cap=8, payload=jnp.zeros((40, 1)),
        fine_r=16, fine_c=16, fine_cap=6,
        fine_payload=jnp.zeros((40, 1)), fine_cell_size=4.0)
    assert (np.asarray(cg.buckets)[0] >= 0).sum() == 8
    assert (np.asarray(fg.buckets) >= 0).sum() == 6
