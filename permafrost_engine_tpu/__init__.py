"""permafrost_engine_tpu — a TPU-native real-time-strategy simulation engine.

A from-scratch rebuild of the capabilities of Permafrost Engine
(https://github.com/eduard-permyakov/permafrost-engine) designed TPU-first:

* The per-tick simulation core (hierarchical flow-field pathfinding, boids
  steering, HRVO/ClearPath collision avoidance, combat, projectiles,
  fog-of-war, formations) runs as one jitted, fused step function over a
  fixed-capacity SoA entity arena resident in HBM.
* The reference's fiber-scheduled fork/join task system becomes data-parallel
  XLA/Pallas kernels over the whole arena; its copy-on-write snapshots become
  functional state; its GPU-compute offload becomes the *primary* device path.
* Scripted game logic stays host-side (the `pf` module, mirroring the
  reference's Python API) and exchanges compact per-tick order/delta buffers
  with the device — the reference's command-queue discipline
  (ref: src/game/movement.c:371-395).
* Multi-chip scaling shards the entity arena over a `jax.sharding.Mesh`
  (data-parallel entities + replicated map state) via `shard_map`.

Package layout:
  core/      engine runtime: config, settings, events, clock, scheduler,
             session (checkpoint/resume), perf
  state/     SoA state schema (entity arena, map, nav, full game state)
  ops/       jnp + Pallas kernels (flow fields, spatial grid, boids,
             clearpath, fog, projectiles, combat, integration)
  nav/       host-side portal graph + A*, field cache bookkeeping
  game/      game systems orchestration (movement, combat, formations, ...)
  parallel/  device mesh + sharded step
  render/    draw-buffer emission (pose batching, instance transforms)
  script/    the `pf` Python API surface
  assets/    .pfobj / .pfmap format support
"""

__version__ = "0.1.0"

from permafrost_engine_tpu.core.config import EngineConfig  # noqa: F401
