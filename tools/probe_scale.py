"""Perf probe: north-star-scale headroom — a 16,384-fighter battle
measured through contact (median step() windows + step_scan windows)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench


def main():
    eng = bench.build_battle(n_per_side=8192)
    n0 = int(np.asarray(eng.state.ents.alive).sum())
    eng.step(60)
    bench.fast_forward_until(eng, lambda a: a < n0)
    eng.step_scan(300)
    print("alive at contact:", int(np.asarray(eng.state.ents.alive).sum()),
          flush=True)
    for name, drive in [("step", eng.step), ("step_scan", eng.step_scan)]:
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            drive(120)
            jax.block_until_ready(eng.state.ents.pos)
            vals.append(120 / (time.perf_counter() - t0))
        print(f"16k contact {name}: {np.median(vals):.1f} fps", flush=True)
    print("alive at end:", int(np.asarray(eng.state.ents.alive).sum()))


if __name__ == "__main__":
    main()
