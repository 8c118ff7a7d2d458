"""Boids steering forces over the entity arena.

Force model and constants follow the reference (ref: src/game/movement.c:
418-437, force builders at movement.c:1524-2023, mirrored in
shaders/compute/movement.glsl:58-120):

  separation 0.6 within r=30 | arrive 0.5, slowing radius 10
  cohesion 0.15 within r=50  | alignment 0.15 within r=10
  MAX_FORCE 0.75 (per 20Hz tick; scaled by tick rate)

All forces are computed for the whole arena at once from a shared
[N, K] neighbour set (the grid's knn output) — the reference's per-entity
fiber loop (move_velocity_task) becomes pure array ops on the VPU.

Velocities here are *per-movement-tick displacements*, matching the
reference's units (ref: movement.c:3464, SURVEY Appendix C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    ALIGNMENT_FORCE,
    ALIGNMENT_RADIUS,
    ARRIVE_FORCE,
    ARRIVE_SLOWING_RADIUS,
    CELL_ARRIVAL_RADIUS,
    COHESION_FORCE,
    COHESION_RADIUS,
    FORMATION_COHESION_FORCE,
    FORMATION_DRAG,
    MAX_FORCE,
    SEPARATION_FORCE,
    SEPARATION_RADIUS,
)

_EPS = 1e-6


def truncate(v: jax.Array, max_len: jax.Array) -> jax.Array:
    """Clamp vector magnitudes to max_len ([..., 2] over [...])."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    max_len = jnp.asarray(max_len)[..., None]
    scale = jnp.where(n > max_len, max_len / jnp.maximum(n, _EPS), 1.0)
    return v * scale


def _gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather per-neighbour values; idx [N, K] with -1 invalid (clamped)."""
    return x[jnp.clip(idx, 0, x.shape[0] - 1)]


def arrive_force(pos, dest, vel, max_speed_tick):
    """Seek with deceleration inside the slowing radius
    (ref: movement.c arrive_force_point)."""
    to_dest = dest - pos
    dist = jnp.linalg.norm(to_dest, axis=-1, keepdims=True)
    speed = max_speed_tick[..., None] * jnp.minimum(dist / ARRIVE_SLOWING_RADIUS, 1.0)
    desired = to_dest / jnp.maximum(dist, _EPS) * speed
    return truncate(desired - vel, MAX_FORCE) * ARRIVE_FORCE


def flow_follow_force(flow_dir, vel, max_speed_tick):
    """Steer toward the flow-field direction at full speed."""
    desired = flow_dir * max_speed_tick[..., None]
    return truncate(desired - vel, MAX_FORCE)


def separation_force(pos, neigh_idx, neigh_valid, neigh_pos):
    """Push away from nearby entities, inverse-square falloff
    (ref: movement.c separation_force)."""
    diff = pos[:, None, :] - neigh_pos                    # [N, K, 2]
    d = jnp.linalg.norm(diff, axis=-1)
    in_range = neigh_valid & (d < SEPARATION_RADIUS)
    w = jnp.where(in_range, 1.0 / jnp.maximum(d * d, 0.25), 0.0)
    force = jnp.sum(diff * w[..., None], axis=1)
    return truncate(force, MAX_FORCE) * SEPARATION_FORCE


def cohesion_force(pos, flock, neigh_idx, neigh_valid, neigh_pos, neigh_flock):
    """Steer toward the centroid of same-flock neighbours within radius."""
    d = jnp.linalg.norm(neigh_pos - pos[:, None, :], axis=-1)
    mate = neigh_valid & (neigh_flock == flock[:, None]) & (flock[:, None] >= 0)
    in_range = mate & (d < COHESION_RADIUS)
    cnt = jnp.sum(in_range, axis=1)
    centroid = jnp.sum(jnp.where(in_range[..., None], neigh_pos, 0.0), axis=1)
    centroid = centroid / jnp.maximum(cnt, 1)[..., None]
    force = jnp.where((cnt > 0)[..., None], centroid - pos, 0.0)
    return truncate(force, MAX_FORCE) * COHESION_FORCE


def flock_cohesion_centroids(pos, flock, mask, *, cells_r, cells_c,
                             cell_size, max_flocks, box: int = 7):
    """Per-entity same-flock centroid via per-(flock, cell) sums + a
    separable (box x box)-cell box filter — cohesion WITHOUT the per-entity
    neighbour window.

    Cohesion is a pure average over flockmates in range, so it factorizes:
    scatter-add (pos, 1) into a [max_flocks, cells] grid keyed by
    (flock, spatial cell), box-sum over the cell dims (two 1-D
    reduce_windows), then each entity row-gathers ONE summed row and
    subtracts itself. Versus the windowed form this (a) removes the
    [N, W2*cap, ·] wide gather cohesion forced the 5x5 window to carry
    (the other boids forces need only 3x3 — their cutoffs are <=10u),
    (b) lifts the bucket-cap truncation (every flockmate counts, not just
    the 16 indexed per cell), and (c) with box=7 reaches 48-64u — nearly
    the reference's 50u COHESION_RADIUS disc (movement.c:418-437) where
    the 5x5 window capped it at ~32u.

    Accumulation is FIXED-POINT INTEGER (each coordinate split into two
    11-bit limbs so i32 never overflows at 16k+ entities): integer adds
    are exact and order-independent, so the result is bit-identical
    under ANY SPMD partitioning of the entity axis — an f32 scatter-add
    re-associates across shards and broke the sharded-tick ==
    replicated-tick contract (tests/test_parallel.py).

    The fixed-point scale is derived from the WORLD EXTENT
    (cells * cell_size): positions must fit the 22-bit item budget, so
    the resolution is 2^(22 - ceil(log2(extent))) per unit — 1/4096 u at
    the default 1024u world, 1/1024 u at a 4096u world. Either way the
    quantization is orders below the crowd forces. (A fixed 4096 scale
    silently clamped coordinates past 1024u and dragged large-map flock
    centroids toward the 1024u boundary.)

    Returns (centroid f32[N,2] — the entity's own position where it has
    no flockmates in range, cnt f32[N])."""
    num_cells = cells_r * cells_c
    c = jnp.clip((pos[:, 0] / cell_size).astype(jnp.int32), 0, cells_c - 1)
    r = jnp.clip((pos[:, 1] / cell_size).astype(jnp.int32), 0, cells_r - 1)
    ok = mask & (flock >= 0)
    f = jnp.clip(flock, 0, max_flocks - 1)
    cell = r * cells_c + c
    idx = jnp.where(ok, f * num_cells + cell, max_flocks * num_cells)
    # fixed-point split: item = round(pos * scale) in [0, 2^22); limbs
    # q = item >> 11 (<= 2^11), rem = item & 2047 — each limb's sum over
    # 2^14 entities stays <= 2^25, comfortably inside i32.  scale is the
    # largest power of two keeping the whole world inside the 22-bit
    # budget (cells_r/cells_c/cell_size are static, so this is traced
    # out as a constant).
    extent = float(max(cells_r, cells_c)) * float(cell_size)
    scale_bits = 12
    while scale_bits > 0 and extent * (1 << scale_bits) > 2.0 ** 22 - 1:
        scale_bits -= 1
    scale = float(1 << scale_bits)
    item = jnp.clip(jnp.round(pos * scale), 0, 2.0 ** 22 - 1
                    ).astype(jnp.int32)                     # [N, 2]
    q, rem = item >> 11, item & 2047
    one = jnp.ones((pos.shape[0], 1), jnp.int32)
    vals = jnp.where(ok[:, None],
                     jnp.concatenate([q, rem, one], axis=1),
                     0)                                      # [N, 5] i32
    sums = jnp.zeros((max_flocks * num_cells + 1, 5), jnp.int32)
    sums = sums.at[idx].add(vals, mode="drop")[:-1]
    g = sums.reshape(max_flocks, cells_r, cells_c, 5)
    g = jax.lax.reduce_window(
        g, 0, jax.lax.add, (1, box, 1, 1), (1, 1, 1, 1), "SAME")
    g = jax.lax.reduce_window(
        g, 0, jax.lax.add, (1, 1, box, 1), (1, 1, 1, 1), "SAME")
    flat = g.reshape(max_flocks * num_cells, 5)
    row = flat[jnp.where(ok, f * num_cells + cell, 0)]      # [N, 5] row gather
    pos_sum = (row[:, 0:2].astype(jnp.float32) * 2048.0
               + row[:, 2:4].astype(jnp.float32)) / scale
    cnt = jnp.where(ok, (row[:, 4] - 1).astype(jnp.float32), 0.0)
    own = item.astype(jnp.float32) / scale                  # self, quantized
    sum_excl = pos_sum - own
    centroid = jnp.where((cnt > 0.5)[:, None],
                         sum_excl / jnp.maximum(cnt, 1.0)[:, None], pos)
    return centroid, cnt


def cohesion_force_from_centroid(pos, centroid, cnt):
    """Cohesion steering from precomputed flock centroids
    (`flock_cohesion_centroids`): same force law as `cohesion_force`."""
    force = jnp.where((cnt > 0.5)[:, None], centroid - pos, 0.0)
    return truncate(force, MAX_FORCE) * COHESION_FORCE


def alignment_force(vel, flock, neigh_idx, neigh_valid, neigh_pos, neigh_vel,
                    neigh_flock, pos):
    """Match average velocity of same-flock neighbours within radius."""
    d = jnp.linalg.norm(neigh_pos - pos[:, None, :], axis=-1)
    mate = neigh_valid & (neigh_flock == flock[:, None]) & (flock[:, None] >= 0)
    in_range = mate & (d < ALIGNMENT_RADIUS)
    cnt = jnp.sum(in_range, axis=1)
    avg = jnp.sum(jnp.where(in_range[..., None], neigh_vel, 0.0), axis=1)
    avg = avg / jnp.maximum(cnt, 1)[..., None]
    force = jnp.where((cnt > 0)[..., None], avg - vel, 0.0)
    return truncate(force, MAX_FORCE) * ALIGNMENT_FORCE


def formation_keep_force(pos, vel, flock, cell, has_cell, flock_formation,
                         max_flocks: int):
    """Formation cohesion + drag (ref: movement.c:1524-2023 formation
    force builders, re-designed for SPMD): each unit with a formation
    cell steers toward its CELL OFFSET relative to the flock's moving
    centroid — target_i = flock_centroid + (cell_i - cell_centroid) —
    so a RANK block holds shape while marching and converges exactly
    onto the cells as the centroid reaches them. Near the own cell,
    velocity is dragged down to stop oscillation around the slot.

    Per-flock centroids are two scatter-adds over [max_flocks] — no
    gathers beyond one row take per entity. Gated on the flock's
    FormationType: plain ring-slot moves (which also carry cells) keep
    the reference's loose-crowd behaviour."""
    in_formation = flock_formation[jnp.clip(flock, 0, max_flocks - 1)] > 0
    mask = has_cell & (flock >= 0) & in_formation
    idx = jnp.where(mask, flock, max_flocks)
    cnt = jnp.zeros((max_flocks + 1,), jnp.float32).at[idx].add(
        1.0, mode="drop")
    m2 = jnp.where(mask[:, None], 1.0, 0.0)
    psum = jnp.zeros((max_flocks + 1, 2), jnp.float32).at[idx].add(
        pos * m2, mode="drop")
    csum = jnp.zeros((max_flocks + 1, 2), jnp.float32).at[idx].add(
        cell * m2, mode="drop")
    denom = jnp.maximum(cnt, 1.0)[:, None]
    pc = psum / denom
    cc = csum / denom
    fi = jnp.clip(idx, 0, max_flocks)
    target = pc[fi] + (cell - cc[fi])
    keep = truncate(target - pos, MAX_FORCE) * FORMATION_COHESION_FORCE
    near_cell = jnp.linalg.norm(cell - pos, axis=-1) < CELL_ARRIVAL_RADIUS
    drag = jnp.where(near_cell[:, None], -vel * FORMATION_DRAG, 0.0)
    return jnp.where(mask[:, None], keep + drag, 0.0)


def preferred_velocity(
    pos: jax.Array,          # f32[N,2]
    vel: jax.Array,          # f32[N,2] per-tick displacement
    flock: jax.Array,        # i32[N]
    dest: jax.Array,         # f32[N,2]
    flow_dir: jax.Array,     # f32[N,2] unit flow direction (0 if none)
    use_arrive: jax.Array,   # bool[N] near-dest / no-field -> arrive steering
    max_speed_tick: jax.Array,  # f32[N] speed cap per movement tick
    neigh_idx: jax.Array,    # i32[N,K]
    neigh_valid: jax.Array,  # bool[N,K]
    moving: jax.Array,       # bool[N] entities actively moving
    neigh_pos: jax.Array | None = None,  # f32[N,K,2] from knn (avoids a gather)
    neigh_vel: jax.Array | None = None,  # f32[N,K,2] bucket payload
    neigh_flock: jax.Array | None = None,  # i32[N,K] bucket payload
    formation_cell: jax.Array | None = None,  # f32[N,2] assigned cell
    has_cell: jax.Array | None = None,        # bool[N]
    flock_formation: jax.Array | None = None,  # i32[max_flocks] FormationType
    max_flocks: int = 0,
    coh_centroid: jax.Array | None = None,  # f32[N,2] flock_cohesion_centroids
    coh_cnt: jax.Array | None = None,        # f32[N]
) -> jax.Array:
    """Combined steering -> preferred velocity for the ClearPath solve.

    Mirrors the reference's per-state total-force assembly
    (ref: movement.c:3414-3452): flow/arrive seek + separation +
    flock cohesion + flock alignment, truncated to MAX_FORCE, integrated
    onto the current velocity, then truncated to per-tick max speed.
    """
    if neigh_pos is None:
        neigh_pos = _gather(pos, neigh_idx)
    if neigh_vel is None:
        neigh_vel = _gather(vel, neigh_idx)
    if neigh_flock is None:
        neigh_flock = _gather(flock, neigh_idx)

    seek = jnp.where(
        use_arrive[..., None],
        arrive_force(pos, dest, vel, max_speed_tick),
        flow_follow_force(flow_dir, vel, max_speed_tick),
    )
    sep = separation_force(pos, neigh_idx, neigh_valid, neigh_pos)
    if coh_centroid is not None and coh_cnt is not None:
        coh = cohesion_force_from_centroid(pos, coh_centroid, coh_cnt)
    else:
        coh = cohesion_force(pos, flock, neigh_idx, neigh_valid, neigh_pos,
                             neigh_flock)
    ali = alignment_force(vel, flock, neigh_idx, neigh_valid, neigh_pos,
                          neigh_vel, neigh_flock, pos)

    total = seek + sep + coh + ali
    if (formation_cell is not None and has_cell is not None
            and flock_formation is not None and max_flocks):
        total = total + formation_keep_force(
            pos, vel, flock, formation_cell, has_cell, flock_formation,
            max_flocks)
    total = truncate(total, MAX_FORCE)
    vpref = truncate(vel + total, max_speed_tick)
    return jnp.where(moving[..., None], vpref, 0.0)
