"""Behavioral tests for boids steering + ClearPath/HRVO avoidance."""

import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import MAX_FORCE
from permafrost_engine_tpu.ops import boids, clearpath


def mk_neigh(n, k, pairs):
    """Dense neighbour arrays from {i: [j, ...]} dict."""
    idx = np.full((n, k), -1, np.int32)
    valid = np.zeros((n, k), bool)
    for i, js in pairs.items():
        for s, j in enumerate(js):
            idx[i, s] = j
            valid[i, s] = True
    return jnp.asarray(idx), jnp.asarray(valid)


def test_truncate():
    v = jnp.array([[3.0, 4.0], [0.1, 0.0]])
    out = np.asarray(boids.truncate(v, jnp.array([1.0, 1.0])))
    np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[1], [0.1, 0.0], rtol=1e-5)


def test_separation_pushes_apart():
    pos = jnp.array([[0.0, 0.0], [2.0, 0.0]])
    idx, valid = mk_neigh(2, 4, {0: [1], 1: [0]})
    npos = pos[jnp.clip(idx, 0, 1)]
    f = np.asarray(boids.separation_force(pos, idx, valid, npos))
    assert f[0, 0] < 0  # entity 0 pushed -x
    assert f[1, 0] > 0  # entity 1 pushed +x


def test_arrive_decelerates():
    pos = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    dest = jnp.array([[100.0, 0.0], [1.0, 0.0]])  # far vs near
    vel = jnp.zeros((2, 2))
    ms = jnp.array([5.0, 5.0])
    f = np.asarray(boids.arrive_force(pos, dest, vel, ms))
    assert f[0, 0] > f[1, 0] > 0  # weaker pull when close


def test_preferred_velocity_stationary_is_zero():
    n = 4
    pos = jnp.asarray(np.random.default_rng(0).random((n, 2)) * 100).astype(jnp.float32)
    vel = jnp.zeros((n, 2))
    idx, valid = mk_neigh(n, 4, {})
    vpref = boids.preferred_velocity(
        pos, vel, jnp.full(n, -1, jnp.int32), pos, jnp.zeros((n, 2)),
        jnp.ones(n, bool), jnp.full(n, 1.0), idx, valid,
        moving=jnp.zeros(n, bool))
    np.testing.assert_allclose(np.asarray(vpref), 0.0)


def test_clearpath_no_neighbours_returns_vpref():
    n = 3
    pos = jnp.array([[0.0, 0.0], [50.0, 0.0], [0.0, 50.0]])
    vel = jnp.zeros((n, 2))
    vpref = jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    idx, valid = mk_neigh(n, 4, {})
    out = clearpath.new_velocities(
        pos, vel, jnp.ones(n), vpref, jnp.ones(n) * 2.0,
        idx, valid, jnp.zeros_like(valid), jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(out), np.asarray(vpref), atol=1e-5)


def _simulate_head_on(ticks=60):
    """Two units walking through each other's start points."""
    pos = np.array([[0.0, 0.0], [30.0, 0.01]], np.float32)
    dests = np.array([[30.0, 0.0], [0.0, 0.0]], np.float32)
    vel = np.zeros((2, 2), np.float32)
    radius = np.ones(2, np.float32)
    ms = np.full(2, 1.0, np.float32)  # per-tick speed
    min_sep = np.inf
    for _ in range(ticks):
        to_dest = dests - pos
        d = np.linalg.norm(to_dest, axis=1, keepdims=True)
        vpref = to_dest / np.maximum(d, 1e-6) * np.minimum(d, ms[:, None])
        idx, valid = mk_neigh(2, 4, {0: [1], 1: [0]})
        newv = np.asarray(clearpath.new_velocities(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(radius),
            jnp.asarray(vpref), jnp.asarray(ms),
            idx, valid, jnp.zeros_like(valid), jnp.ones(2, bool)))
        pos = pos + newv
        vel = newv
        min_sep = min(min_sep, np.linalg.norm(pos[0] - pos[1]))
    return pos, dests, min_sep


def test_clearpath_head_on_avoidance():
    pos, dests, min_sep = _simulate_head_on()
    # never interpenetrated (combined radius 2.0; allow small tolerance)
    assert min_sep > 1.6, f"units collided: min separation {min_sep:.2f}"
    # both still made progress to their destinations
    final_err = np.linalg.norm(pos - dests, axis=1)
    assert (final_err < 3.0).all(), f"units did not arrive: {final_err}"


def test_clearpath_static_obstacle_detour():
    """A unit seeking through a static obstacle must route around it."""
    pos = np.array([[0.0, 0.0], [6.0, 0.0]], np.float32)  # obstacle at x=6
    dest = np.array([20.0, 0.0], np.float32)
    vel = np.zeros((2, 2), np.float32)
    radius = np.array([1.0, 2.0], np.float32)
    ms = np.array([1.0, 0.0], np.float32)
    min_sep = np.inf
    for _ in range(50):
        to_dest = dest - pos[0]
        d = np.linalg.norm(to_dest)
        vpref0 = to_dest / max(d, 1e-6) * min(d, 1.0)
        vpref = np.stack([vpref0, np.zeros(2)]).astype(np.float32)
        idx, valid = mk_neigh(2, 4, {0: [1]})
        static = np.zeros((2, 4), bool)
        static[0, 0] = True
        newv = np.asarray(clearpath.new_velocities(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(radius),
            jnp.asarray(vpref), jnp.asarray(ms),
            idx, valid, jnp.asarray(static),
            jnp.array([True, False])))
        pos = pos + newv
        vel = newv
        min_sep = min(min_sep, np.linalg.norm(pos[0] - pos[1]))
    assert min_sep > 2.4, f"clipped the obstacle: min sep {min_sep:.2f}"
    assert np.linalg.norm(pos[0] - dest) < 3.0, f"never arrived: {pos[0]}"


def test_cohesion_reach_quantified():
    """Quantifies cohesion's effective reach (core/config.py
    COHESION_RADIUS note): the cell-sum path (`flock_cohesion_centroids`,
    a 7x7-cell box around the entity's cell) reaches 48-64u — bracketing
    the reference's 50u disc (movement.c:418-437), where the old 5x5
    neighbour window capped it at ~32u. The box is rectangular in CELL
    space: a mate at 45u is always visible, one at 70u never is."""
    import jax.numpy as jnp

    from permafrost_engine_tpu.ops.boids import flock_cohesion_centroids

    def cnt_at(dist):
        pos = jnp.asarray([[8.0, 8.0], [8.0 + dist, 8.0]], jnp.float32)
        cen, cnt = flock_cohesion_centroids(
            pos, jnp.asarray([0, 0], jnp.int32), jnp.ones(2, bool),
            cells_r=16, cells_c=16, cell_size=16.0, max_flocks=4)
        return float(cnt[0])

    assert cnt_at(25.0) == 1.0
    assert cnt_at(45.0) == 1.0   # the reference-50 regime now pulls
    assert cnt_at(70.0) == 0.0   # beyond the 7x7 box: invisible
    # guaranteed minimum reach: 3 whole cells
    from permafrost_engine_tpu.core.config import SPATIAL_CELL_SIZE
    assert 3 * SPATIAL_CELL_SIZE == 48.0


def test_flock_cohesion_centroids_matches_oracle():
    """flock_cohesion_centroids (per-(flock,cell) sums + 7x7 box filter)
    must equal the brute-force definition: the mean position of same-flock
    mates whose spatial CELL lies within +-3 cells, excluding self."""
    import jax.numpy as jnp

    from permafrost_engine_tpu.ops.boids import flock_cohesion_centroids

    rng = np.random.default_rng(3)
    n, cells, size = 96, 16, 16.0
    pos = rng.random((n, 2)).astype(np.float32) * (cells * size)
    flock = rng.integers(-1, 4, n).astype(np.int32)
    mask = rng.random(n) < 0.85

    cen, cnt = flock_cohesion_centroids(
        jnp.asarray(pos), jnp.asarray(flock), jnp.asarray(mask),
        cells_r=cells, cells_c=cells, cell_size=size, max_flocks=8)
    cen, cnt = np.asarray(cen), np.asarray(cnt)

    cell_c = (pos[:, 0] // size).astype(int)
    cell_r = (pos[:, 1] // size).astype(int)
    for i in range(n):
        if not mask[i] or flock[i] < 0:
            assert cnt[i] == 0
            continue
        mates = [j for j in range(n)
                 if j != i and mask[j] and flock[j] == flock[i]
                 and abs(cell_r[j] - cell_r[i]) <= 3
                 and abs(cell_c[j] - cell_c[i]) <= 3]
        assert cnt[i] == len(mates)
        if mates:
            np.testing.assert_allclose(
                cen[i], pos[mates].mean(axis=0), rtol=1e-4, atol=1e-3)


def test_flock_cohesion_large_map_no_clamp():
    """Regression: on worlds larger than 1024u the fixed-point centroid
    accumulator must NOT clamp coordinates to 1024u (a fixed 1/4096
    scale used to, dragging large-map flock centroids toward the 1024u
    boundary). A 4096u world (16x16 chunks, like
    tests/test_portal_update.py) with flockmates near (1500,1500) must
    read each other's true positions."""
    import jax.numpy as jnp

    from permafrost_engine_tpu.ops.boids import flock_cohesion_centroids

    pos = np.asarray([[1510.0, 1500.0], [1500.0, 1500.0], [1505.0, 1490.0]],
                     np.float32)
    cen, cnt = flock_cohesion_centroids(
        jnp.asarray(pos), jnp.zeros(3, jnp.int32), jnp.ones(3, bool),
        cells_r=256, cells_c=256, cell_size=16.0, max_flocks=4)
    cen, cnt = np.asarray(cen), np.asarray(cnt)
    assert (cnt == 2.0).all()
    for i in range(3):
        mates = [j for j in range(3) if j != i]
        np.testing.assert_allclose(cen[i], pos[mates].mean(axis=0),
                                   rtol=0, atol=2e-3)
