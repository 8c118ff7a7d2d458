"""Perf probe: attribute MOVEMENT substep cost to its stages by ablation.

Monkeypatches individual stages of movement_substep to constants and
measures raw-tick throughput on the contact-phase battle state. XLA's
dead-code elimination removes upstream producers of unused results, so
`no_neigh` also removes the grid build + window gather + top-k."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import bench
from permafrost_engine_tpu.core.config import MAX_NEIGHBOURS
from permafrost_engine_tpu.game import step as step_mod
from permafrost_engine_tpu.ops import boids, clearpath, grid
from permafrost_engine_tpu.ops import velocity as vel_ops


def timed_fps(tick, state0, cfg, frames=120, windows=3):
    from permafrost_engine_tpu.state.schema import empty_deltas

    state = jax.device_put(state0)
    acc = empty_deltas(cfg)
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
    n = eng.cfg.max_ents

    def no_hrvo(pos, vel, radius, vpref, max_speed, neigh_idx, neigh_valid,
                neigh_static, moving_mask, **kw):
        return vpref

    def no_boids(pos, vel, flock, dest, flow_dir, use_arrive, max_speed_tick,
                 neigh_idx, neigh_valid, moving, **kw):
        return flow_dir * max_speed_tick[:, None]

    def no_neigh(sgrid, query_pos, query_slot, window=5):
        # constant-shape stand-in for window_candidates: DCE then removes
        # the grid build + prewindow + wide gathers upstream
        q = query_pos.shape[0]
        w2cap = window * window * sgrid.buckets.shape[1]
        pay_c = (sgrid.bucket_payload.shape[-1]
                 if sgrid.bucket_payload is not None else 0)
        cand = jnp.full((q, w2cap), -1, jnp.int32)
        cpos = jnp.full((q, w2cap, 2), 1e30, jnp.float32)
        cpay = (jnp.zeros((q, w2cap, pay_c), jnp.float32)
                if pay_c else None)
        return cand, cpos, cpay, jnp.zeros((q, w2cap), bool)

    def no_contact(cgrid, query_pos, query_slot):
        # constant-shape stand-in for contact_candidates: all-invalid
        # candidates zero the pushout and disable the projection, and DCE
        # removes the fine-grid build (only shapes are read here)
        q = query_pos.shape[0]
        cap9 = 9 * cgrid.buckets.shape[1]
        cand = jnp.full((q, cap9), -1, jnp.int32)
        cpos = jnp.full((q, cap9, 2), 1e30, jnp.float32)
        pay_c = (cgrid.bucket_payload.shape[-1]
                 if cgrid.bucket_payload is not None else 0)
        cpay = jnp.zeros((q, cap9, pay_c), jnp.float32) if pay_c else None
        return cand, cpos, cpay, jnp.zeros((q, cap9), bool)

    def no_flow_vel(pos, flock, field_slot, flow, global_slot, global_flow,
                    ent_gslot, *, chunks_r, chunks_c):
        q = pos.shape[0]
        return jnp.zeros((q, 2), jnp.float32), jnp.zeros(q, bool)

    def no_los(pos, flock, los_slot, los, *, chunks_r, chunks_c):
        return jnp.ones(pos.shape[0], bool)

    def no_restamp(cfg, ents, nav):
        return nav

    orig = dict(cp=clearpath.new_velocities, bo=boids.preferred_velocity,
                wc=grid.window_candidates, cc=grid.contact_candidates,
                fv=vel_ops.flow_velocity,
                dl=vel_ops.dest_los, rs=step_mod._restamp_blockers)
    variants = [
        ("full", {}),
        ("no_hrvo", [(clearpath, "new_velocities", no_hrvo)]),
        ("no_boids", [(boids, "preferred_velocity", no_boids)]),
        ("no_neigh", [(grid, "window_candidates", no_neigh)]),
        ("no_contact", [(grid, "contact_candidates", no_contact)]),
        ("no_fields", [(vel_ops, "flow_velocity", no_flow_vel),
                       (vel_ops, "dest_los", no_los)]),
        ("no_restamp", [(step_mod, "_restamp_blockers", no_restamp)]),
    ]
    th = getattr(eng, "_tile_height", None)
    for name, patches in variants:
        for mod, attr, fn in (patches or []):
            setattr(mod, attr, fn)
        try:
            tick = step_mod.make_tick(eng.cfg, th, donate=False)
            fps = timed_fps(tick, contact, eng.cfg)
            print(f"{name}: {fps:.1f} fps", flush=True)
        finally:
            clearpath.new_velocities = orig["cp"]
            boids.preferred_velocity = orig["bo"]
            grid.window_candidates = orig["wc"]
            grid.contact_candidates = orig["cc"]
            vel_ops.flow_velocity = orig["fv"]
            vel_ops.dest_los = orig["dl"]
            step_mod._restamp_blockers = orig["rs"]


if __name__ == "__main__":
    main()
