"""Sharded simulation step: the multi-chip driving mode.

The entity arena shards data-parallel over the `ents` mesh axis while
map/nav/field state replicates (a few MB; every entity-sharded kernel
reads it). XLA's SPMD partitioner inserts the all-gathers for the
neighbour queries over ICI — the same neighbour-only communication
structure the reference gets from its shared-memory snapshot reads
(SURVEY §2.9 mapping).

Usage:
    mesh = make_mesh()
    sharded = make_sharded_tick(cfg, mesh)
    state = shard_state(cfg, mesh, state)
    state, acc = sharded(state, acc)
"""

from __future__ import annotations

import functools

import jax

from permafrost_engine_tpu.core.config import EngineConfig
from permafrost_engine_tpu.game.step import make_tick
from permafrost_engine_tpu.parallel.mesh import (  # noqa: F401
    ENT_AXIS,
    make_mesh,
    shard_state,
    state_shardings,
)


def deltas_shardings(cfg: EngineConfig, mesh):
    """Shardings for the TickDeltas accumulator: entity-major leaves shard
    over the ents axis, projectile-pool leaves replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from permafrost_engine_tpu.state.schema import empty_deltas

    repl = NamedSharding(mesh, P())
    ent_sharded = NamedSharding(mesh, P(ENT_AXIS))
    return jax.tree_util.tree_map(
        lambda x: ent_sharded if x.shape[:1] == (cfg.max_ents,) else repl,
        empty_deltas(cfg))


def make_sharded_tick(cfg: EngineConfig, mesh, tile_height=None,
                      map_sharded: bool = False, skin_bank=None):
    """Jit the tick with explicit input shardings over `mesh`. With
    `map_sharded`, nav/fog/global-field grids shard their rows too
    (SURVEY §2.9 chunk sharding for map-heavy configs)."""
    from permafrost_engine_tpu.state.schema import init_state

    template = init_state(cfg)
    sh = state_shardings(cfg, mesh, template, map_sharded)
    deltas_sh = deltas_shardings(cfg, mesh)
    # out_shardings pinned so grids STAY row-sharded across ticks (XLA
    # would otherwise replicate rebuilt outputs like the blocker restamp)
    return jax.jit(make_tick(cfg, tile_height, donate=False,
                             skin_bank=skin_bank),
                   in_shardings=(sh, deltas_sh),
                   out_shardings=(sh, deltas_sh))


def sharded_engine(engine, mesh, map_sharded: bool = False):
    """Re-home an existing Engine's state + tick onto a mesh in place."""
    from permafrost_engine_tpu.state.schema import empty_deltas

    engine.state = shard_state(engine.cfg, mesh, engine.state, map_sharded)
    engine._tick_fn = make_sharded_tick(
        engine.cfg, mesh, getattr(engine, "_tile_height", None), map_sharded,
        skin_bank=getattr(engine, "_skin_bank", None))
    # the accumulator swapped in at drain boundaries must come out sharded
    # the same way the tick expects it
    engine._make_empty = jax.jit(
        functools.partial(empty_deltas, engine.cfg),
        out_shardings=deltas_shardings(engine.cfg, mesh))
    engine._acc = engine._make_empty()
    engine._scan_fn = None
    if map_sharded and engine.cfg.field_h % mesh.devices.size == 0:
        # whole-map seek/surround field builds run row-sharded with ICI
        # halo exchange instead of replicated (SURVEY §2.9 halo mapping)
        from permafrost_engine_tpu.parallel.fields import (
            make_sharded_integrate)
        engine.nav.sharded_integrate = make_sharded_integrate(
            mesh, engine.cfg.field_h, engine.cfg.field_w, axis=ENT_AXIS)
    return engine
