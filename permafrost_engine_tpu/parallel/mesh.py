"""Device mesh + sharding layout for the simulation state.

Multi-chip scaling (the reference is single-host with a 64-thread fiber
pool; SURVEY §2.9 maps it to an ICI mesh): the entity arena is
data-parallel over the `ents` mesh axis. Map-scale state — per-layer nav
grids [L, H, W], fog [F, TH, TW], whole-map fields [G, H, W] — can
additionally shard its ROW dimension over the same axis (`map_sharded`),
the chunk-sharding SURVEY §2.9 prescribes for map-heavy configs: the
blocker restamp, fog convolutions and field sampling then run on row
bands, and XLA's SPMD partitioner inserts the ICI collectives where
entity-sharded kernels meet row-sharded grids (halo exchanges for the
stencils, all-to-alls for position-keyed scatters/gathers).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from permafrost_engine_tpu.core.config import EngineConfig
from permafrost_engine_tpu.state.schema import GameState

ENT_AXIS = "ents"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (ENT_AXIS,))


def state_shardings(cfg: EngineConfig, mesh: Mesh, state: GameState,
                    map_sharded: bool = False):
    """Sharding pytree: entity-arena leaves split on the ents axis; with
    `map_sharded`, map-scale grids split their row dimension too;
    everything else replicated."""
    repl = NamedSharding(mesh, P())
    ent_sharded = NamedSharding(mesh, P(ENT_AXIS))
    row_sharded = NamedSharding(mesh, P(None, ENT_AXIS))

    def leaf_sharding(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == cfg.max_ents:
            return ent_sharded
        return repl

    ents_sh = jax.tree_util.tree_map(leaf_sharding, state.ents)
    rest = jax.tree_util.tree_map(lambda x: repl, state)
    rest = rest.replace(ents=ents_sh)
    if state.anim is not None:
        # anim leaves (clip/start [N], palettes [N, J, 4, 4]) are
        # entity-axis data like the arena
        rest = rest.replace(
            anim=jax.tree_util.tree_map(leaf_sharding, state.anim))
    if map_sharded:
        n_dev = mesh.devices.size
        rows_ok = cfg.field_h % n_dev == 0 and cfg.tiles_h % n_dev == 0

        def grid_sharding(x):
            # [C, H, W] grids whose H divides the mesh: shard rows
            if (hasattr(x, "shape") and x.ndim == 3
                    and x.shape[1] % n_dev == 0
                    and x.shape[1] in (cfg.field_h, cfg.tiles_h)):
                return row_sharded
            return repl

        if rows_ok:
            rest = rest.replace(
                nav=jax.tree_util.tree_map(grid_sharding, state.nav),
                fog=rest.fog.replace(state=row_sharded),
                fields=rest.fields.replace(global_flow=row_sharded),
            )
    return rest


def shard_state(cfg: EngineConfig, mesh: Mesh, state: GameState,
                map_sharded: bool = False) -> GameState:
    sh = state_shardings(cfg, mesh, state, map_sharded)
    return jax.tree_util.tree_map(jax.device_put, state, sh)
