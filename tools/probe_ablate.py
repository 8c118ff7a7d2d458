"""Perf probe: attribute tick cost to subsystems by ablation.

Builds tick variants with individual substeps no-op'ed, restores the same
contact-phase battle state for each, and measures pipelined throughput of
the raw device tick (no host systems). Diagnostic only — ablated ticks
diverge simulation-wise; only the timing matters."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench
from permafrost_engine_tpu.game import step as step_mod


def timed_fps(tick, state0, cfg, frames=120, windows=3):
    from permafrost_engine_tpu.state.schema import empty_deltas

    state = jax.device_put(state0)
    acc = empty_deltas(cfg)
    # warm (compile)
    state, acc = tick(state, acc)
    jax.block_until_ready(state.ents.pos)
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(frames):
            state, acc = tick(state, acc)
        jax.block_until_ready(state.ents.pos)
        vals.append(frames / (time.perf_counter() - t0))
    return float(np.median(vals))


def main():
    eng = bench.build_battle()
    n0 = int(np.asarray(eng.state.ents.alive).sum())
    eng.step(60)
    bench.fast_forward_until(eng, lambda a: a < n0)
    eng.step_scan(300)
    print("alive at contact:", int(np.asarray(eng.state.ents.alive).sum()),
          flush=True)
    contact = jax.device_get(eng.state)

    def passthrough(cfg, s, d, *extra):
        return s, d

    def fog_passthrough(cfg, s, th):
        return s

    orig = dict(move=step_mod.movement_substep,
                combat=step_mod.combat_substep,
                fog=step_mod.fog_substep)
    variants = [
        ("full", {}),
        ("no_move", {"movement_substep": passthrough}),
        ("no_combat", {"combat_substep": passthrough}),
        ("no_fog", {"fog_substep": fog_passthrough}),
    ]
    th = getattr(eng, "_tile_height", None)
    for name, patches in variants:
        for attr, fn in patches.items():
            setattr(step_mod, attr, fn)
        try:
            tick = step_mod.make_tick(eng.cfg, th, donate=False)
            fps = timed_fps(tick, contact, eng.cfg)
            print(f"{name}: {fps:.1f} fps", flush=True)
        finally:
            step_mod.movement_substep = orig["move"]
            step_mod.combat_substep = orig["combat"]
            step_mod.fog_substep = orig["fog"]


if __name__ == "__main__":
    main()
