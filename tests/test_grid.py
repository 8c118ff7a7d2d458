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
