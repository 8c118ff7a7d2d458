"""Auction assignment vs exact oracles."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from permafrost_engine_tpu.ops.assignment import auction_assign

try:
    from scipy.optimize import linear_sum_assignment
    HAVE_SCIPY = True
except ImportError:
    HAVE_SCIPY = False


def brute_force(cost):
    n, m = cost.shape
    best, best_perm = np.inf, None
    for perm in itertools.permutations(range(m), n):
        c = sum(cost[i, j] for i, j in enumerate(perm))
        if c < best:
            best, best_perm = c, perm
    return best, best_perm


def run(cost, bidders=None, objects=None):
    n, m = cost.shape
    bm = np.ones(n, bool) if bidders is None else bidders
    om = np.ones(m, bool) if objects is None else objects
    out = np.asarray(auction_assign(
        jnp.asarray(cost), jnp.asarray(bm), jnp.asarray(om)))
    return out


def total(cost, assign):
    return sum(cost[i, j] for i, j in enumerate(assign) if j >= 0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_square_small_optimal(seed):
    rng = np.random.default_rng(seed)
    cost = rng.random((6, 6)).astype(np.float32) * 100
    assign = run(cost)
    # valid permutation
    assert sorted(assign) == list(range(6))
    opt, _ = brute_force(cost)
    got = total(cost, assign)
    assert got <= opt + 1.0, f"auction {got} vs optimal {opt}"


def test_rect_more_objects():
    rng = np.random.default_rng(3)
    cost = rng.random((5, 9)).astype(np.float32) * 10
    assign = run(cost)
    assert len(set(assign)) == 5  # all distinct
    opt, _ = brute_force(cost)
    assert total(cost, assign) <= opt + 1.0


def test_masked_bidders_objects():
    rng = np.random.default_rng(4)
    cost = rng.random((8, 8)).astype(np.float32)
    bm = np.array([True, True, False, True, False, True, True, False])
    om = np.array([True] * 6 + [False, False])
    assign = run(cost, bm, om)
    assert (assign[~bm] == -1).all()
    active = assign[bm]
    assert (active >= 0).all() and (active < 6).all()
    assert len(set(active)) == len(active)


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy not available")
def test_medium_vs_scipy():
    rng = np.random.default_rng(5)
    n = 64
    cost = (rng.random((n, n)) * 1000).astype(np.float32)
    assign = run(cost)
    assert sorted(assign) == list(range(n))
    r, c = linear_sum_assignment(cost)
    opt = cost[r, c].sum()
    got = total(cost, assign)
    assert got <= opt * 1.01 + 1.0, f"auction {got} vs scipy {opt}"


def test_formation_distance_costs():
    """Realistic formation case: units assigned to nearest-ish cells with
    no duplicates."""
    rng = np.random.default_rng(6)
    units = rng.random((32, 2)).astype(np.float32) * 100
    cells = np.stack(np.meshgrid(np.arange(8), np.arange(4)), -1).reshape(-1, 2)
    cells = (cells * 5 + 50).astype(np.float32)
    cost = np.linalg.norm(units[:, None] - cells[None, :], axis=-1) ** 2
    assign = run(cost.astype(np.float32))
    assert sorted(assign) == list(range(32))
