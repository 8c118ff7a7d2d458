"""Batched path requests: same-frame order spam costs O(1) device
dispatches (ref: the reference amortizes via the dest-keyed field cache,
src/navigation/fieldcache.c:59-102; here the dispatches themselves
batch)."""

import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    EntityFlags,
)
from permafrost_engine_tpu.game.engine import Engine


def _engine():
    cfg = EngineConfig(max_ents=128, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=32, max_projectiles=8,
                       field_slab_slots=64, los_slab_slots=64)
    cost = np.ones((1, cfg.field_h, cfg.field_w), np.uint8)
    cost[0, 40:44, 0:100] = COST_IMPASSABLE   # a wall so paths differ
    return Engine(cfg, cost_base=cost)


class _CountingIntegrate:
    def __init__(self, fn):
        self.fn = fn
        self.calls = 0

    def __call__(self, *a, **k):
        self.calls += 1
        return self.fn(*a, **k)


def test_replanning_20_flocks_is_one_batch():
    """One structure commit replanning 20 flocks costs ONE start/goal
    integrate + ONE field-build integrate, not 20+ of each."""
    eng = _engine()
    rng = np.random.default_rng(3)
    flocks = []
    for i in range(20):
        u = eng.spawn_batch(
            (rng.random((1, 2)) * 80 + np.array([20.0 + 8 * i, 250.0]))
            .astype(np.float32), max_speed=40.0)
        assert eng.move(u, (400.0 - 9 * i, 30.0 + 9 * i))
        flocks.append(u)
    eng.step(2)

    counter = _CountingIntegrate(eng.nav._integrate)
    eng.nav._integrate = counter
    # structure in the corridor every path crosses -> all 20 replan
    b = eng.spawn_batch(np.array([[420.0, 170.0]], np.float32), radius=6.0,
                        flags=int(EntityFlags.COLLISION
                                  | EntityFlags.BUILDING), max_speed=0.0)
    eng.set_structure_blocking(b[0], True)
    requests0 = eng.nav.stats["requests"]
    eng._commit_nav()
    replanned = eng.nav.stats["requests"] - requests0
    assert replanned >= 10, f"only {replanned} flocks replanned"
    # capped compile-shape buckets: batches of >16 split into 16-sized
    # chunks (service.CHUNK_BATCH_CAP) so storm batch sizes always hit
    # already-compiled shapes; the dispatch count stays O(jobs/16), far
    # from the 40+ of per-flock sequential installs
    assert counter.calls <= 8, (
        f"{replanned} replans dispatched {counter.calls} integrations "
        "(expected ~1 start/goal batch + ~1 field batch per 16 jobs)")


def test_mixed_layer_move_is_one_batch():
    """A move order splitting into per-layer flocks plans both layers in
    one batched request."""
    cfg = EngineConfig(max_ents=32, chunks_r=2, chunks_c=2, num_layers=4,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    eng = Engine(cfg)
    small = eng.spawn_batch(np.array([[96.0, 96.0]], np.float32),
                            radius=1.0, max_speed=80.0)
    big = eng.spawn_batch(np.array([[120.0, 96.0]], np.float32),
                          radius=8.0, max_speed=80.0)
    counter = _CountingIntegrate(eng.nav._integrate)
    eng.nav._integrate = counter
    assert eng.move(small + big, (400.0, 400.0))
    assert eng.nav.stats["requests"] >= 2     # two per-layer flocks
    assert counter.calls <= 2, f"{counter.calls} integrate dispatches"
