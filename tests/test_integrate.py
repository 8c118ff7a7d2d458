"""movement_update semantics (SURVEY Appendix C parity items):
heading gate, speed truncation, impassable rejection, garrison override,
wedge settling."""

import numpy as np
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    HEADING_RESUME_DEG,
    MAX_TURN_RATE_DEG,
    MoveState,
    NAV_TILE_SIZE,
    VEL_HIST_LEN,
)
from permafrost_engine_tpu.ops.integrate import movement_update


def run_update(n=1, **over):
    h, w = 32, 32
    base = dict(
        alive=jnp.ones(n, bool),
        moving_mask=jnp.ones(n, bool),
        pos=jnp.full((n, 2), 60.0),
        new_vel=jnp.tile(jnp.asarray([[2.0, 0.0]]), (n, 1)),
        dest=jnp.full((n, 2), 100.0),
        movestate=jnp.full(n, int(MoveState.MOVING), jnp.int32),
        facing=jnp.full(n, np.arctan2(2.0, 0.0)),  # facing +x
        vel_hist=jnp.zeros((n, VEL_HIST_LEN, 2)),
        vel_hist_idx=jnp.zeros(n, jnp.int32),
        wait_ticks=jnp.zeros(n, jnp.int32),
        stuck_ticks=jnp.zeros(n, jnp.int32),
        layer=jnp.zeros(n, jnp.int32),
        cost_base=jnp.ones((1, h, w), jnp.uint8),
        blockers=jnp.zeros((1, h, w), jnp.int32),
        garrisoned=jnp.zeros(n, bool),
        flock_arrived=jnp.zeros(n, bool),
        has_cell=jnp.zeros(n, bool),
    )
    base.update(over)
    return movement_update(**base)


def test_position_advances_by_velocity():
    out = run_update()
    np.testing.assert_allclose(np.asarray(out["pos"])[0], [62.0, 60.0])
    assert out["movestate"][0] == MoveState.MOVING


def test_heading_gate_halts_and_turns():
    """Velocity opposite to facing (>90 deg error): the unit halts and
    turns in place at MAX_TURN_RATE per tick (movement.c:433-436)."""
    out = run_update(new_vel=jnp.asarray([[-2.0, 0.0]]))
    assert out["movestate"][0] == MoveState.TURNING
    np.testing.assert_allclose(np.asarray(out["pos"])[0], [60.0, 60.0])
    # facing moved by exactly the turn rate
    d = abs(float(out["facing"][0]) - np.arctan2(2.0, 0.0))
    np.testing.assert_allclose(np.rad2deg(d), MAX_TURN_RATE_DEG, atol=0.1)


def test_turning_resumes_when_aligned():
    facing = np.arctan2(2.0, 0.0) + np.deg2rad(HEADING_RESUME_DEG / 2)
    out = run_update(movestate=jnp.asarray([int(MoveState.TURNING)]),
                     facing=jnp.asarray([facing]))
    assert out["movestate"][0] == MoveState.MOVING


def test_impassable_tile_rejected():
    cost = np.ones((1, 32, 32), np.uint8)
    # block the tile the move would enter (x=62 -> tile col 15)
    cost[0, int(60.0 // NAV_TILE_SIZE), 15] = COST_IMPASSABLE
    out = run_update(cost_base=jnp.asarray(cost))
    np.testing.assert_allclose(np.asarray(out["pos"])[0], [60.0, 60.0])


def test_blocked_tile_rejected_unless_already_blocked():
    # velocity 4.0 crosses from tile col 15 into col 16
    vel = jnp.asarray([[4.0, 0.0]])
    blockers = np.zeros((1, 32, 32), np.int32)
    blockers[0, 15, 16] = 1                  # entering a blocked tile: no
    out = run_update(new_vel=vel, blockers=jnp.asarray(blockers))
    np.testing.assert_allclose(np.asarray(out["pos"])[0], [60.0, 60.0])
    # but a unit already standing on a blocker may move onto another one
    blockers[0, 15, 15] = 1
    out = run_update(new_vel=vel, blockers=jnp.asarray(blockers))
    np.testing.assert_allclose(np.asarray(out["pos"])[0], [64.0, 60.0])


def test_garrisoned_forced_arrived():
    out = run_update(garrisoned=jnp.ones(1, bool))
    assert out["movestate"][0] == MoveState.ARRIVED
    assert out["arrived"][0]


def test_arrival_threshold():
    out = run_update(dest=jnp.asarray([[63.0, 60.0]]))
    assert out["movestate"][0] == MoveState.ARRIVED
    np.testing.assert_allclose(np.asarray(out["vel"])[0], [0.0, 0.0])


def test_wedge_counter_settles_near_goal():
    out = run_update(new_vel=jnp.zeros((1, 2)),
                     dest=jnp.asarray([[70.0, 60.0]]),
                     stuck_ticks=jnp.asarray([25]))
    assert out["movestate"][0] == MoveState.ARRIVED


def test_velocity_history_written():
    out = run_update()
    vh = np.asarray(out["vel_hist"])[0]
    np.testing.assert_allclose(vh[0], [2.0, 0.0])
    assert int(out["vel_hist_idx"][0]) == 1
