"""Multi-chip scaling evidence on the virtual 8-device mesh.

Real multi-chip hardware is unreachable in this environment, so this probe
records the scaling MODEL the north-star "v5e-8" target relies on
(SURVEY §2.9 halo mapping):

  1. Per-tick COLLECTIVE inventory from the compiled HLO — op counts and
     moved bytes for replicated vs entity-sharded vs map-sharded ticks.
     Entity-sharded ticks should communicate via all-gathers of the
     entity arrays (the neighbour-query exchange); map sharding adds the
     grid-row halo traffic.
  2. A 64k-entity map-sharded soak: N ticks sharded vs single-device,
     asserting BIT-IDENTITY, with per-shard memory from XLA's
     memory_analysis — bounded per-device footprint is what makes the
     pod-scale config viable.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_shard.py
Writes one JSON line (and saves it to /tmp/probe_shard.json).
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import numpy as np

# the axon TPU plugin registers regardless of JAX_PLATFORMS; forcing CPU
# needs jax.config before backend init (CLAUDE.md environment gotcha)
jax.config.update("jax_platforms", "cpu")

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "collective-permute", "all-to-all")

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
                "f64": 8, "s64": 8, "u64": 8}


def collective_inventory(hlo_text: str) -> dict:
    """Count collective ops and sum their result bytes from HLO text."""
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    # result shapes look like:  %all-gather.3 = f32[20224,2]{1,0} all-gather(
    pat = re.compile(
        r"= *\(?([a-z0-9]+)\[([0-9,]*)\][^=]*?(" + "|".join(_COLLECTIVES)
        + r")\(")
    for m in pat.finditer(hlo_text):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        size = 1
        for d in dims.split(","):
            if d:
                size *= int(d)
        out[op]["count"] += 1
        out[op]["bytes"] += size * _DTYPE_BYTES.get(dt, 4)
    out["total_ops"] = sum(v["count"] for k, v in out.items()
                           if isinstance(v, dict))
    out["total_bytes"] = sum(v["bytes"] for k, v in out.items()
                             if isinstance(v, dict))
    return out


def compiled_tick(cfg, mesh, mode: str):
    """Compile one tick in the given sharding mode; return (compiled, hlo)."""
    import jax

    from permafrost_engine_tpu.game.step import make_tick
    from permafrost_engine_tpu.parallel.step import (
        deltas_shardings, make_sharded_tick, state_shardings)
    from permafrost_engine_tpu.state.schema import empty_deltas, init_state

    state = init_state(cfg)
    acc = empty_deltas(cfg)
    if mode == "replicated":
        from jax.sharding import NamedSharding, PartitionSpec as P
        import jax as _jax
        repl = NamedSharding(mesh, P())
        sh = _jax.tree_util.tree_map(lambda x: repl, state)
        dsh = _jax.tree_util.tree_map(lambda x: repl, acc)
        fn = jax.jit(make_tick(cfg, None, donate=False),
                     in_shardings=(sh, dsh), out_shardings=(sh, dsh))
    else:
        fn = make_sharded_tick(cfg, mesh, None,
                               map_sharded=(mode == "map_sharded"))
        sh = state_shardings(cfg, mesh, state, mode == "map_sharded")
        dsh = deltas_shardings(cfg, mesh)
        state = jax.device_put(state, sh)
        acc = jax.device_put(acc, dsh)
    lowered = fn.lower(state, acc)
    compiled = lowered.compile()
    return compiled, compiled.as_text()


def probe_collectives(n_ents: int = 4096) -> dict:
    from permafrost_engine_tpu.core.config import EngineConfig
    from permafrost_engine_tpu.parallel.mesh import make_mesh

    cfg = EngineConfig(max_ents=n_ents)
    mesh = make_mesh()
    res = {}
    for mode in ("replicated", "sharded", "map_sharded"):
        compiled, hlo = compiled_tick(cfg, mesh, mode)
        inv = collective_inventory(hlo)
        mem = {}
        try:
            ma = compiled.memory_analysis()
            mem = {
                "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
                "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
            }
        except Exception:
            pass
        res[mode] = {"collectives": inv, "memory_per_device": mem}
    return res


def soak_bit_identity(n_ents: int = 65536, ticks: int = 8) -> dict:
    """64k-entity map-sharded soak: sharded ticks == single-device ticks."""
    import jax
    import jax.numpy as jnp

    from permafrost_engine_tpu.core.config import EngineConfig
    from permafrost_engine_tpu.game.step import make_tick
    from permafrost_engine_tpu.parallel.mesh import make_mesh
    from permafrost_engine_tpu.parallel.step import (
        deltas_shardings, make_sharded_tick, state_shardings)
    from permafrost_engine_tpu.state.schema import empty_deltas, init_state

    cfg = EngineConfig(max_ents=n_ents)
    mesh = make_mesh()
    rng = np.random.default_rng(7)

    state = init_state(cfg)
    n = n_ents - 128
    pos = (rng.random((n, 2)) * 900 + 50).astype(np.float32)
    e = state.ents
    state = state.replace(ents=e.replace(
        alive=e.alive.at[:n].set(True),
        uid=e.uid.at[:n].set(jnp.arange(n)),
        pos=e.pos.at[:n].set(jnp.asarray(pos)),
        max_speed=e.max_speed.at[:n].set(20.0),
        hp=e.hp.at[:n].set(100.0),
        max_hp=e.max_hp.at[:n].set(100.0),
        radius=e.radius.at[:n].set(1.0),
        movestate=e.movestate.at[:n].set(1),   # MOVING
        dest=e.dest.at[:n].set(jnp.asarray(
            (rng.random((n, 2)) * 900 + 50).astype(np.float32))),
    ))
    acc = empty_deltas(cfg)

    # single-device reference
    tick1 = jax.jit(make_tick(cfg, None, donate=False))
    s1, a1 = state, acc
    for _ in range(ticks):
        s1, a1 = tick1(s1, a1)
    s1 = jax.device_get(s1)

    # map-sharded over the mesh
    sh = state_shardings(cfg, mesh, state, True)
    dsh = deltas_shardings(cfg, mesh)
    s2 = jax.device_put(state, sh)
    a2 = jax.device_put(acc, dsh)
    tick8 = make_sharded_tick(cfg, mesh, None, map_sharded=True)
    comp = tick8.lower(s2, a2).compile()   # compile once, reuse below
    mem = {}
    try:
        ma = comp.memory_analysis()
        mem = {"argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
               "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1)}
    except Exception:
        pass
    for _ in range(ticks):
        s2, a2 = comp(s2, a2)
    s2 = jax.device_get(s2)

    leaves1 = jax.tree_util.tree_leaves(s1)
    leaves2 = jax.tree_util.tree_leaves(s2)
    bit_identical = all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(leaves1, leaves2))
    return {"n_ents": n_ents, "ticks": ticks,
            "bit_identical": bool(bit_identical),
            "sharded_memory_per_device": mem,
            "n_devices": int(mesh.devices.size)}


def main():
    out = {
        "mesh_devices": 8,
        "collectives_by_mode": probe_collectives(),
        "soak_64k_map_sharded": soak_bit_identity(),
    }
    line = json.dumps(out)
    print(line)
    with open("/tmp/probe_shard.json", "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
