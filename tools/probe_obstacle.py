"""Obstacle-map battle attribution probe (real TPU).

Measures scan-mode fps at battle contact on the obstacle map under
ablations, A/B within ONE session (the relay varies run to run):

  full         — everything on (the bench's contact configuration)
  no_fog       — fog disabled (isolates the height-aware shadowcaster)
  no_blockers  — blocker machinery cadence off (isolates nav churn)
  no_host      — raw scan segments, no host systems at all

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_obstacle.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import numpy as np


def measure(eng, frames=120, reps=3, scan=True):
    drive = eng.step_scan if scan else eng.step
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        drive(frames)
        jax.block_until_ready(eng.state.ents.pos)
        vals.append(frames / (time.perf_counter() - t0))
    return float(np.median(vals))


def ablate(eng, scan=True):
    base = dict(eng.perf.counters)
    stats0 = dict(eng.nav.stats)
    full = measure(eng, scan=scan)
    # per-subsystem host-time attribution for the 'full' window (ms
    # accumulated over reps*frames frames; see engine._host_systems_tick)
    delta = {k: round(v - base.get(k, 0.0), 1)
             for k, v in eng.perf.counters.items()
             if k.endswith("_ms") and v - base.get(k, 0.0) > 0.1}
    sdelta = {k: v - stats0.get(k, 0) for k, v in eng.nav.stats.items()
              if isinstance(v, (int, float)) and v != stats0.get(k, 0)}
    print(f"full: {full:.1f} fps  host_ms={delta}  nav={sdelta}",
          flush=True)

    # fog off (device flag; the fog substep becomes a no-op read)
    eng.state = eng.state.replace(fog=eng.state.fog.replace(
        enabled=jax.numpy.asarray(False)))
    no_fog = measure(eng, scan=scan)
    print(f"no_fog: {no_fog:.1f} fps", flush=True)
    eng.state = eng.state.replace(fog=eng.state.fog.replace(
        enabled=jax.numpy.asarray(True)))

    # blocker machinery off
    saved_chunks = eng.nav.flock_chunks
    eng.nav.flock_chunks = {}
    no_blockers = measure(eng, scan=scan)
    print(f"no_blockers: {no_blockers:.1f} fps", flush=True)
    eng.nav.flock_chunks = saved_chunks

    # raw scan segments without host cadence work: temporarily silence
    # diplomacy+seek so step_scan takes the no-host path
    dip = eng._host_diplomacy.copy()
    eng._host_diplomacy[:] = 0
    seek = eng._seek_flocks
    eng._seek_flocks = {}
    eng.nav.flock_chunks = {}
    no_host = measure(eng, scan=scan)
    print(f"no_host: {no_host:.1f} fps", flush=True)
    eng._host_diplomacy[:] = dip
    eng._seek_flocks = seek
    eng.nav.flock_chunks = saved_chunks

    return {
        "full": round(full, 1), "no_fog": round(no_fog, 1),
        "no_blockers": round(no_blockers, 1), "no_host": round(no_host, 1),
    }


def raw_loop_fps(eng, frames=120, windows=3):
    """Tight dispatch loop on the engine's own tick_fn/state — the step()
    path minus all host machinery (drains, perf scopes, host systems).
    The gap between this and step()-no_host is step()'s fixed overhead."""
    state, acc = eng.state, eng._acc
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(frames):
            state, acc = eng._tick_fn(state, acc)
        jax.block_until_ready(state.ents.pos)
        vals.append(frames / (time.perf_counter() - t0))
    eng.state, eng._acc = state, acc
    eng._frame += frames * windows
    return float(np.median(vals))


def main():
    import bench

    eng = bench.build_battle(terrain=True)
    n0 = 10000
    eng.step(60)
    bench.fast_forward_until(eng, lambda a: a < n0)
    eng.step_scan(300)
    bench.place_midfight_structures(eng)
    print("alive at contact:", bench.alive_count(eng), flush=True)
    print("== contact (scan) ==", flush=True)
    contact = ablate(eng)

    # late phase — the bench headline's worst window (fps_late on the
    # obstacle map); ablate it in both drive modes
    bench.fast_forward_until(eng, lambda a: a < 0.55 * n0)
    print("alive at late:", bench.alive_count(eng), flush=True)
    print("== late (scan) ==", flush=True)
    late_scan = ablate(eng)
    print("== late (step) ==", flush=True)
    late_step = ablate(eng, scan=False)
    raw = raw_loop_fps(eng)
    print(f"raw dispatch loop: {raw:.1f} fps", flush=True)
    dev = eng.profile_tick(30)
    print(f"device-exact tick: {dev['ms_p50']:.2f} ms p50", flush=True)

    print({"contact_scan": contact, "late_scan": late_scan,
           "late_step": late_step, "raw_loop": round(raw, 1),
           "device_ms_p50": round(dev["ms_p50"], 2)})


if __name__ == "__main__":
    main()
