"""Compile-shape buckets: batched nav device calls pad to a FIXED shape
set ({1,2,4,8,16} chunk integrates, {1,2} LOS, {1,2,4} seek) and chunk
larger batches, so a mid-battle rebuild storm can never hit an
uncompiled batch shape (a fresh XLA compile through a remote relay is a
multi-second stall inside the interactive loop — measured 8.4 s +
10.7 s collapsing one bench window to 3.7 fps).

Equivalence: chunked installs must be BIT-IDENTICAL to one big batch —
the per-chunk integrate is a min-plus fixpoint, so extra relaxation
sweeps after an element converges are no-ops and batch composition
cannot leak between elements.
"""

import jax
import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    EntityFlags,
)
from permafrost_engine_tpu.game.engine import Engine
from permafrost_engine_tpu.nav import service as nav_service


def test_batch_buckets_partition():
    for k in (1, 2, 3, 5, 8, 15, 16, 17, 31, 33, 64):
        for cap in (2, 4, 16):
            bs = nav_service.batch_buckets(k, cap)
            assert sum(c for _, c, _ in bs) == k
            allowed = {1 << i for i in range(cap.bit_length())} | {cap}
            assert all(p in allowed and c <= p for _, c, p in bs), (k, cap, bs)
            # contiguous, ordered slices
            assert bs[0][0] == 0
            for i in range(1, len(bs)):
                assert bs[i][0] == bs[i - 1][0] + bs[i - 1][1]


def _storm_engine():
    cfg = EngineConfig(max_ents=128, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=32, max_projectiles=8,
                       field_slab_slots=64, los_slab_slots=64)
    cost = np.ones((1, cfg.field_h, cfg.field_w), np.uint8)
    cost[0, 40:44, 0:100] = COST_IMPASSABLE
    eng = Engine(cfg, cost_base=cost)
    rng = np.random.default_rng(3)
    for i in range(17):
        u = eng.spawn_batch(
            (rng.random((1, 2)) * 80 + np.array([20.0 + 6 * i, 250.0]))
            .astype(np.float32), max_speed=40.0)
        assert eng.move(u, (400.0 - 9 * i, 30.0 + 9 * i))
    eng.step(2)
    # structure in the shared corridor -> mass replan through _commit_nav
    b = eng.spawn_batch(np.array([[420.0, 170.0]], np.float32), radius=6.0,
                        flags=int(EntityFlags.COLLISION
                                  | EntityFlags.BUILDING), max_speed=0.0)
    eng.set_structure_blocking(b[0], True)
    eng._commit_nav()
    return eng


def test_chunked_storm_bit_identical(monkeypatch):
    """The same 17-flock replan storm with tiny bucket caps (worst-case
    chunking) produces bit-identical field slabs + slot tables to the
    default caps."""
    ref = _storm_engine()
    monkeypatch.setattr(nav_service, "CHUNK_BATCH_CAP", 2)
    monkeypatch.setattr(nav_service, "LOS_BATCH_CAP", 1)
    monkeypatch.setattr(nav_service, "SEEK_BATCH_CAP", 1)
    chunked = _storm_engine()

    np.testing.assert_array_equal(np.asarray(ref.state.fields.flow),
                                  np.asarray(chunked.state.fields.flow))
    np.testing.assert_array_equal(np.asarray(ref.state.fields.los),
                                  np.asarray(chunked.state.fields.los))
    np.testing.assert_array_equal(ref.nav.slot_mirror, chunked.nav.slot_mirror)
    np.testing.assert_array_equal(ref.nav.los_mirror, chunked.nav.los_mirror)


def test_storm_dispatch_shapes_capped():
    """Every integrate dispatched by the storm uses a batch size from the
    fixed bucket set — no data-dependent shapes reach the device."""
    sizes = []
    cfg = EngineConfig(max_ents=128, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=32, max_projectiles=8,
                       field_slab_slots=64, los_slab_slots=64)
    cost = np.ones((1, cfg.field_h, cfg.field_w), np.uint8)
    cost[0, 40:44, 0:100] = COST_IMPASSABLE
    eng = Engine(cfg, cost_base=cost)
    orig = eng.nav._integrate

    def spy(costs, *a, **k):
        sizes.append(int(costs.shape[0]))
        return orig(costs, *a, **k)

    eng.nav._integrate = spy
    rng = np.random.default_rng(3)
    for i in range(17):
        u = eng.spawn_batch(
            (rng.random((1, 2)) * 80 + np.array([20.0 + 6 * i, 250.0]))
            .astype(np.float32), max_speed=40.0)
        assert eng.move(u, (400.0 - 9 * i, 30.0 + 9 * i))
    assert sizes, "no batched integrates dispatched"
    allowed = {1, 2, 4, 8, 16}
    assert all(s in allowed for s in sizes), sizes


def test_prewarm_compiles_without_mutating_state():
    cfg = EngineConfig(max_ents=64, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    eng = Engine(cfg)
    eng.add_faction(0)
    before = jax.tree_util.tree_map(np.asarray, eng.state)
    eng.prewarm_nav()
    after = eng.state
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

