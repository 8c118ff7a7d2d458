"""Device mesh + sharding layout for the simulation state.

Multi-chip scaling (the reference is single-host with a 64-thread fiber
pool; SURVEY §2.9 maps it to an ICI mesh): the entity arena is
data-parallel over the `ents` mesh axis, map/nav/fog/field state is
replicated (it is small — a few MB — and read by every entity-sharded
kernel), and XLA's SPMD partitioner inserts the all-gathers for
neighbour queries over ICI. Chunk-sharded map state + halo exchange is
the planned next stage for very large maps.
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


def state_shardings(cfg: EngineConfig, mesh: Mesh, state: GameState):
    """Sharding pytree: entity-arena leaves split on the ents axis,
    everything else replicated."""
    repl = NamedSharding(mesh, P())
    ent_sharded = NamedSharding(mesh, P(ENT_AXIS))

    def leaf_sharding(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == cfg.max_ents:
            return ent_sharded
        return repl

    ents_sh = jax.tree_util.tree_map(leaf_sharding, state.ents)
    rest = jax.tree_util.tree_map(lambda x: repl, state)
    return rest.replace(ents=ents_sh)


def shard_state(cfg: EngineConfig, mesh: Mesh, state: GameState) -> GameState:
    sh = state_shardings(cfg, mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, sh)
