"""Micro-batched interactive stepping (Engine.step frame fusion).

step() fuses the frames between host-cadence boundaries into one lax.scan
dispatch. The contract: fused stepping is BIT-IDENTICAL to per-frame
stepping — same device state, same drained events in the same order —
because the tick is pure and every host effect is cadence-gated
(drain/economy/seek periods). Live tasks force per-frame dispatches;
a non-empty event queue does not (both modes service it at call end).
"""

import numpy as np
import pytest

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    FIELD_RES,
)
from permafrost_engine_tpu.game.engine import Engine


def small_cfg():
    return EngineConfig(
        max_ents=64,
        chunks_r=2,
        chunks_c=2,
        num_layers=1,
        max_flocks=8,
        max_projectiles=32,
        field_slab_slots=16,
        los_slab_slots=16,
    )


def walled_cost(cfg):
    cost = np.ones((cfg.num_layers, cfg.field_h, cfg.field_w), np.uint8)
    cost[:, FIELD_RES - 1:FIELD_RES + 1, 8:] = COST_IMPASSABLE
    return cost


def build(micro: bool) -> tuple[Engine, list[int]]:
    cfg = small_cfg()
    eng = Engine(cfg, cost_base=walled_cost(cfg))
    eng.micro_batching = micro
    rng = np.random.default_rng(0)
    pos = (np.array([400.0, 100.0]) + rng.random((8, 2)) * 30).astype(
        np.float32)
    uids = eng.spawn_batch(pos, faction=0, max_speed=80.0)
    assert eng.move(uids, (400.0, 400.0))
    return eng, uids


def test_fused_bit_identical_to_per_frame():
    a, _ = build(micro=False)
    b, _ = build(micro=True)
    # odd frame count: exercises partial segments + boundary alignment
    a.step(75)
    b.step(75)
    assert b._frame == a._frame == 75
    ea, eb = a.state.ents, b.state.ents
    np.testing.assert_array_equal(np.asarray(ea.pos), np.asarray(eb.pos))
    np.testing.assert_array_equal(np.asarray(ea.movestate),
                                  np.asarray(eb.movestate))
    np.testing.assert_array_equal(np.asarray(ea.facing),
                                  np.asarray(eb.facing))
    assert int(a.state.tick) == int(b.state.tick)
    # drained host events match exactly (kind, uid) in order
    assert a.events == b.events


def test_fused_handler_parity_with_events_flowing():
    """Drains deliver events mid-window (motion/arrival while fused):
    registered handlers must fire with the same payloads in the same
    order as per-frame stepping — fusion with a non-empty queue is
    behaviour-identical because both modes service the queue at call
    end (game/engine.py Engine.step)."""
    from permafrost_engine_tpu.core.events import EventType

    def drive(micro: bool):
        eng, _ = build(micro=micro)
        calls = []
        for ev in (EventType.MOTION_START, EventType.MOTION_END):
            eng.bus.subscribe(ev, lambda a, e=ev: calls.append((int(e),
                                                                a["uid"])))
        for _ in range(15):     # segment-sized calls: queue stays warm
            eng.step(5)
        return eng, calls

    a, ca = drive(False)
    b, cb = drive(True)
    assert ca, "scenario generated no events — test is vacuous"
    assert ca == cb
    np.testing.assert_array_equal(np.asarray(a.state.ents.pos),
                                  np.asarray(b.state.ents.pos))


def test_fusible_frames_respects_cadences():
    eng, _ = build(micro=True)
    # at frame 0 the next boundary is drain_period away
    assert eng._fusible_frames() == eng.drain_period
    eng._frame = 7
    # drain at 12 is 5 away; economy at 12 the same; seek at 30 further
    assert eng._fusible_frames() == 5
    eng._frame = 0
    eng.seek_refresh_period = 4
    assert eng._fusible_frames() == 4


def test_tasks_force_per_frame():
    from permafrost_engine_tpu.core import sched as S

    eng, _ = build(micro=True)

    wakes = []

    def body(task):
        for _ in range(10):
            wakes.append(eng._frame)
            yield S.Sleep(1)

    eng.sched.create(body)
    eng.step(10)
    # a per-frame task must wake on consecutive frames, not at segment
    # boundaries
    assert wakes[:5] == [1, 2, 3, 4, 5]


def test_pause_mid_step_stays_frame_granular():
    from permafrost_engine_tpu.core import sched as S
    from permafrost_engine_tpu.core.config import SimState

    eng, _ = build(micro=True)

    def body(task):
        yield S.Sleep(3)
        eng.sim_state = SimState.PAUSED_FULL
        yield S.Sleep(1)

    eng.sched.create(body)
    eng.step(12)
    # paused at frame 4: exactly 4 device ticks ran
    assert int(eng.state.tick) == 4
