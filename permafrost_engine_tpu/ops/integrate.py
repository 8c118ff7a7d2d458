"""Movement integration + state machine as masked dense updates.

Replicates the semantics of the reference's entity_compute_update
(ref: src/game/movement.c:2303-2421) for the whole arena at once:

* position advances by the per-movement-tick velocity, rejected unless the
  target tile is pathable (or the entity was already on a blocked tile)
* arrival within threshold -> ARRIVED, velocity zeroed
* heading gate: halt-and-turn when heading error > 90 deg, resume < 10 deg,
  turning in place at MAX_TURN_RATE per tick (movement.c:433-436)
* facing derived from a weighted moving average over the velocity-history
  ring (movement.c:2067-2084)
* WAITING counts down WAIT_TICKS then resumes MOVING (movement.c:432)

The reference emits `movestate_patch` records applied next tick on the main
thread; functional updates make the whole patch discipline implicit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    ARRIVAL_THRESHOLD,
    CELL_ARRIVAL_RADIUS,
    COST_IMPASSABLE,
    HEADING_HALT_DEG,
    HEADING_RESUME_DEG,
    MAX_TURN_RATE_DEG,
    MoveState,
    NAV_TILE_SIZE,
    VEL_HIST_LEN,
    WAIT_TICKS,
)

_EPS = 1e-6


def _angle_of(v: jax.Array) -> jax.Array:
    """Heading angle (radians) of [..., 2] (x, z) vectors; atan2(x, -z) puts
    0 at -z ("north") matching screen-space convention. Any consistent
    convention works — only differences of angles matter."""
    return jnp.arctan2(v[..., 0], -v[..., 1])


def _wrap_pi(a: jax.Array) -> jax.Array:
    return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi


def facing_from_history(vel_hist: jax.Array, facing: jax.Array) -> jax.Array:
    """Weighted moving average of the velocity-history ring: recent entries
    weigh more (ref: movement.c orient_to_velocity_history:2291)."""
    h = vel_hist.shape[1]
    w = jnp.arange(1, h + 1, dtype=jnp.float32)[None, :, None]
    avg = jnp.sum(vel_hist * w, axis=1) / jnp.sum(w)
    speed = jnp.linalg.norm(avg, axis=-1)
    new_facing = _angle_of(avg)
    return jnp.where(speed > 1e-3, new_facing, facing)


def tile_passable(
    pos: jax.Array,           # f32[N,2]
    layer: jax.Array,         # i32[N]
    cost_base: jax.Array,     # u8[L,H,W]
    blockers: jax.Array,      # i32[L,H,W]
) -> tuple[jax.Array, jax.Array]:
    """(passable, blocked) at each entity's nav tile for its layer."""
    h, w = cost_base.shape[-2], cost_base.shape[-1]
    c = jnp.clip((pos[:, 0] / NAV_TILE_SIZE).astype(jnp.int32), 0, w - 1)
    r = jnp.clip((pos[:, 1] / NAV_TILE_SIZE).astype(jnp.int32), 0, h - 1)
    in_bounds = (
        (pos[:, 0] >= 0) & (pos[:, 0] < w * NAV_TILE_SIZE)
        & (pos[:, 1] >= 0) & (pos[:, 1] < h * NAV_TILE_SIZE)
    )
    cost = cost_base[layer, r, c]
    blk = blockers[layer, r, c]
    return (cost != COST_IMPASSABLE) & in_bounds, blk > 0


@functools.partial(jax.jit, static_argnames=())
def movement_update(
    *,
    alive: jax.Array,
    moving_mask: jax.Array,     # bool[N] entities in a movement-driven state
    pos: jax.Array,
    new_vel: jax.Array,         # f32[N,2] clearpath output (per-tick)
    dest: jax.Array,
    movestate: jax.Array,
    facing: jax.Array,
    vel_hist: jax.Array,
    vel_hist_idx: jax.Array,
    wait_ticks: jax.Array,
    stuck_ticks: jax.Array,
    layer: jax.Array,
    cost_base: jax.Array,
    blockers: jax.Array,
    garrisoned: jax.Array,      # bool[N] forced-ARRIVED (movement.c:2341)
    flock_arrived: jax.Array,   # bool[N] an arrived flockmate is adjacent
    has_cell: jax.Array,        # bool[N] unit owns a private ring/formation
                                # slot (propagation only fires when wedged)
    depen: jax.Array | None = None,  # f32[N,2] capped de-penetration
                                # displacement (pre-masked by the caller);
                                # applied to ALL eligible entities — even
                                # stationary ones — outside the stuck/jam
                                # accounting
):
    """One movement-tick integration pass. Returns a dict of updated fields
    plus an `arrived` event mask."""
    st = movestate
    was_moving = moving_mask & alive

    # ---- heading gate ------------------------------------------------------
    vel_angle = _angle_of(new_vel)
    speed = jnp.linalg.norm(new_vel, axis=-1)
    heading_err = jnp.abs(_wrap_pi(vel_angle - facing))
    need_turn = was_moving & (speed > 1e-3) & (
        heading_err > jnp.deg2rad(HEADING_HALT_DEG))
    turning = st == MoveState.TURNING

    # turning entities rotate in place toward their velocity direction
    turn_step = jnp.deg2rad(MAX_TURN_RATE_DEG)
    delta = _wrap_pi(vel_angle - facing)
    turn_facing = facing + jnp.clip(delta, -turn_step, turn_step)
    resume = turning & (jnp.abs(delta) < jnp.deg2rad(HEADING_RESUME_DEG))

    # ---- position integration ----------------------------------------------
    advance = was_moving & ~need_turn & ~turning
    vel_adv = jnp.where(advance[:, None], new_vel, 0.0)
    _, was_blocked = tile_passable(pos, layer, cost_base, blockers)

    def _ok(cand):
        # accept unless impassable, or newly entering a blocked tile
        # (ref: movement.c:2350-2358)
        passable, cand_blocked = tile_passable(
            cand, layer, cost_base, blockers)
        return passable & (~cand_blocked | was_blocked)

    # WALL SLIDING: when the full move is rejected, keep the passable axis
    # component (larger first). Without it, units pressed on a wall with
    # any into-wall force component (cohesion toward flockmates across it,
    # formation keep forces) freeze entirely instead of sliding along the
    # wall toward a gap — a hard deadlock at choke points. The reference
    # gets sliding from its physics response; here it is part of the
    # integrator.
    def _slide(base, vel):
        vx = vel * jnp.asarray([1.0, 0.0])
        vz = vel * jnp.asarray([0.0, 1.0])
        ok_full = _ok(base + vel)
        ok_x = _ok(base + vx)
        ok_z = _ok(base + vz)
        prefer_x = jnp.abs(vel[:, 0]) >= jnp.abs(vel[:, 1])
        first = jnp.where(prefer_x[:, None], vx, vz)
        second = jnp.where(prefer_x[:, None], vz, vx)
        ok_first = jnp.where(prefer_x, ok_x, ok_z)
        ok_second = jnp.where(prefer_x, ok_z, ok_x)
        return jnp.where(
            ok_full[:, None], vel,
            jnp.where(ok_first[:, None], first,
                      jnp.where(ok_second[:, None], second, 0.0)))

    new_pos = pos + _slide(pos, vel_adv)
    eff_vel = new_pos - pos

    # ---- stuck/wedge counter (ref: src/game/arrival.h stuck counters) -------
    # progress = getting closer to the destination; oscillating in place
    # around an occupied goal must not reset the counter
    d_before = jnp.linalg.norm(dest - pos, axis=-1)
    d_after = jnp.linalg.norm(dest - new_pos, axis=-1)
    # closing speed must be a meaningful fraction of the commanded speed;
    # crawling at a few percent of capability through a packed crowd is
    # "wedged" for arrival purposes
    closing = (d_before - d_after) > jnp.maximum(
        0.05, 0.1 * jnp.linalg.norm(new_vel, axis=-1))
    # FAR from the goal, real displacement is progress even when it does
    # not close on the destination: units queueing laterally along a wall
    # toward a choke move sideways for many ticks — freezing them into
    # WAITING walls at the choke mouth deadlocks the queue. Near the goal
    # only dest-closing counts (crowd packing must still settle).
    far = d_after >= 5 * ARRIVAL_THRESHOLD
    moving_well = jnp.linalg.norm(new_pos - pos, axis=-1) > jnp.maximum(
        0.02, 0.3 * jnp.linalg.norm(new_vel, axis=-1))
    progressing = closing | (far & moving_well)
    # leaky accumulator (debounced, ref: arrival.h): bursts of intermittent
    # creep in a packed crowd must not reset the wedge detection
    new_stuck = jnp.clip(
        stuck_ticks + jnp.where(was_moving & ~progressing, 1, -2), 0, 100)

    # ---- arrival -----------------------------------------------------------
    dist_dest = jnp.linalg.norm(dest - new_pos, axis=-1)
    arrived_now = was_moving & (dist_dest < ARRIVAL_THRESHOLD)
    # wedged near the goal for ~0.6s of move ticks: settle where we stand
    # (ring slots make this the exception path; the common case is exact
    # per-unit slot arrival, ref: src/game/arrival.h)
    arrived_now = arrived_now | (
        was_moving & (new_stuck > 12) & (dist_dest < 5 * ARRIVAL_THRESHOLD))
    # group arrival propagation (ref: arrival.c stuck counters): shared-dest
    # flocks settle next to arrived flockmates freely; slot owners settle
    # beside arrived mates when wedged — near their slot, or anywhere once
    # physically jammed (the slot may be buried inside the settled crowd)
    jammed = jnp.linalg.norm(eff_vel, axis=-1) < jnp.maximum(
        0.02, 0.15 * jnp.linalg.norm(new_vel, axis=-1))
    arrived_now = arrived_now | (
        was_moving & flock_arrived & (
            ((dist_dest < CELL_ARRIVAL_RADIUS) & (~has_cell | (new_stuck > 8)))
            | (jammed & (new_stuck > 8))))
    arrived_now = arrived_now | (garrisoned & alive)

    # ---- waiting (ref: movement.c WAIT_TICKS 60, :432, :702) ----------------
    # physically jammed FAR from the goal and the settled group
    # (displacement tiny vs. the commanded velocity — NOT mere lack of goal
    # progress, which is normal while wall-following a detour): stand down
    # for WAIT_TICKS move ticks, then resume and retry
    wait_now = was_moving & ~turning & ~need_turn & jammed & \
        ~flock_arrived & (new_stuck > 20) & \
        (dist_dest >= 5 * ARRIVAL_THRESHOLD) & ~arrived_now
    waiting = st == MoveState.WAITING
    new_wait = jnp.where(waiting, jnp.maximum(wait_ticks - 1, 0), wait_ticks)
    # staggered stand-downs: a jammed clump resuming all at once re-jams
    # immediately (thundering herd); per-slot jitter drains it in waves
    jitter = jnp.arange(pos.shape[0], dtype=jnp.int32) % 16
    new_wait = jnp.where(wait_now, WAIT_TICKS + 4 * jitter, new_wait)
    wait_done = waiting & (new_wait == 0)

    # ---- state transitions (priority: arrived > wait > turn > resume) --------
    new_st = st
    new_st = jnp.where(wait_done, MoveState.MOVING, new_st)
    new_st = jnp.where(need_turn & ~turning, MoveState.TURNING, new_st)
    new_st = jnp.where(resume, MoveState.MOVING, new_st)
    new_st = jnp.where(wait_now, MoveState.WAITING, new_st)
    new_st = jnp.where(arrived_now, MoveState.ARRIVED, new_st)
    new_st = jnp.where(alive, new_st, st)

    # ---- velocity history + facing ------------------------------------------
    idx = vel_hist_idx % VEL_HIST_LEN
    # roll ring so that position 0 is oldest: write at cursor
    vh = vel_hist.at[jnp.arange(pos.shape[0]), idx].set(eff_vel)
    new_idx = (vel_hist_idx + 1) % VEL_HIST_LEN
    # ordered view for weighted average: use unrolled ring as-is (weights
    # approximate recency; exactness of ordering matters little at H=14)
    new_facing = jnp.where(
        turning | need_turn, turn_facing, facing_from_history(vh, facing))
    new_facing = jnp.where(alive, new_facing, facing)

    out_vel = jnp.where((arrived_now | ~was_moving)[:, None], 0.0, eff_vel)

    # ---- de-penetration (crowd quality) -------------------------------------
    # Capped pushout of overlapping units, applied LAST with the same
    # axis-decomposed wall rejection as the move (corrections never press
    # through walls). It stays out of eff_vel / stuck / jam / arrival
    # accounting: it is a solver correction, not motion — the reference
    # keeps units separated via hard VO feasibility (clearpath.c:388);
    # our least-violating fallback admits overlap under choke pressure,
    # and stationary melee crowds would otherwise stay stacked.
    final_pos = new_pos if depen is None else new_pos + _slide(new_pos, depen)

    return dict(
        pos=final_pos,
        vel=out_vel,
        movestate=new_st,
        facing=new_facing,
        vel_hist=vh,
        vel_hist_idx=new_idx,
        wait_ticks=new_wait,
        stuck_ticks=jnp.where(arrived_now | wait_now, 0, new_stuck),
        arrived=arrived_now & (st != MoveState.ARRIVED),
    )
