"""Perf probe: per-frame step() vs segmented step_scan() at battle contact.

Identifies whether the headline is dispatch-bound (relay round trips per
frame) or compute-bound (device tick). Not part of the bench."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench


def fps_of(eng, fn, frames=120, windows=3):
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        fn(frames)
        jax.block_until_ready(eng.state.ents.pos)
        vals.append(frames / (time.perf_counter() - t0))
    return float(np.median(vals))


def main():
    eng = bench.build_battle()
    n0 = int(np.asarray(eng.state.ents.alive).sum())
    eng.step(60)
    bench.fast_forward_until(eng, lambda a: a < n0)
    eng.step_scan(300)
    print("at contact, alive:", int(np.asarray(eng.state.ents.alive).sum()))

    fps_step = fps_of(eng, eng.step)
    print("step() fps (micro-batched):", round(fps_step, 2), flush=True)
    eng.micro_batching = False
    fps_step1 = fps_of(eng, eng.step)
    print("step() fps (per-frame dispatch):", round(fps_step1, 2),
          flush=True)
    eng.micro_batching = True
    fps_scan = fps_of(eng, eng.step_scan)
    print("step_scan() fps:", round(fps_scan, 2), flush=True)
    st = eng.profile_tick(30)
    print("exact device tick:",
          {k: (round(v, 2) if isinstance(v, (int, float)) else v)
           for k, v in st.items()})


if __name__ == "__main__":
    main()
