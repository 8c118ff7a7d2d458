"""Checkpoint/resume: session save must restore bit-identical device state
and continue deterministically (the reference's determinism contract,
SURVEY §5)."""

import numpy as np
import jax

from permafrost_engine_tpu.core.config import DiplomacyState
from permafrost_engine_tpu.core.session import (
    SubsessionStack,
    load_session_bytes,
    save_session_bytes,
)
from permafrost_engine_tpu.game.engine import Engine
from tests.test_combat import small_cfg


def build_engine():
    eng = Engine(small_cfg())
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    rng = np.random.default_rng(3)
    eng.spawn_batch((rng.random((6, 2)) * 100 + 30).astype(np.float32),
                    faction=0, max_speed=40.0)
    eng.spawn_batch((rng.random((4, 2)) * 50 + 150).astype(np.float32),
                    faction=1)
    uids = list(eng.uid_to_slot)
    eng.move(uids[:6], (200.0, 200.0))
    return eng


def assert_states_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_load_roundtrip_and_determinism():
    eng = build_engine()
    eng.step(30)

    blob = save_session_bytes(eng)
    restored = load_session_bytes(blob)

    assert_states_equal(eng.state, restored.state)
    assert restored.uid_to_slot == eng.uid_to_slot
    assert restored._next_uid == eng._next_uid

    # determinism: both continue identically
    eng.step(60)
    restored.step(60)
    assert_states_equal(eng.state, restored.state)

    # restored engine can still plan paths (nav caches restored)
    uids = list(restored.uid_to_slot)
    assert restored.move(uids[:2], (50.0, 220.0))


def test_mid_harvest_session_continues_identically():
    """Economy/garrison/region/selection/anim/audio/task state survives a
    save (ref: subsession_save streams, src/session.c:176-233,
    game.c:3679-3713): a harvester saved mid-cycle continues after load and
    delivers the same amount as the uninterrupted engine."""
    from tests.test_economy import eng_with
    from permafrost_engine_tpu.game.economy import HarvesterState

    eng, h, r, s = eng_with(
        harvester_at=(100.0, 100.0), resource_at=(140.0, 100.0),
        storage_at=(100.0, 140.0))
    eng.regions.add_circle("depot", (100.0, 140.0), 30.0)
    eng.selection.selection = [h]
    eng.anim.register(h, model="worker")
    eng.audio.tracks = ["theme"]
    eng.audio.play_music("theme")
    eng.economy.gather(h, r)
    # run until mid-cycle (harvesting or transporting, not idle)
    for _ in range(20):
        eng.step(6)
        if eng.economy.harvesters[h].state in (
                HarvesterState.HARVESTING, HarvesterState.TO_STORAGE):
            break
    st = eng.economy.harvesters[h].state
    assert st in (HarvesterState.HARVESTING, HarvesterState.TO_STORAGE)

    blob = save_session_bytes(eng)
    restored = load_session_bytes(blob)

    # host streams restored exactly
    assert restored.economy.harvesters[h].state == st
    assert restored.economy.harvesters[h].carried == \
        eng.economy.harvesters[h].carried
    assert restored.economy.resources[r].amount == \
        eng.economy.resources[r].amount
    assert "depot" in restored.regions.regions
    assert restored.selection.selection == [h]
    assert h in restored.anim.states
    assert restored.audio.current == "theme" and restored.audio.playing

    # identical continuation: both deliver the same wood total
    for e in (eng, restored):
        for _ in range(80):
            e.step(6)
            if e.economy.storages[s].stored.get("Wood", 0) >= 20:
                break
    assert (eng.economy.storages[s].stored
            == restored.economy.storages[s].stored)
    assert restored.economy.storages[s].stored.get("Wood", 0) >= 20
    assert_states_equal(eng.state, restored.state)


def test_subsession_stack():
    eng = build_engine()
    stack = SubsessionStack()
    p_before = eng.pos_of(1).copy()
    stack.push(eng)
    assert stack.depth == 1
    eng.step(120)
    assert np.linalg.norm(eng.pos_of(1) - p_before) > 1.0
    restored = stack.pop()
    np.testing.assert_allclose(restored.pos_of(1), p_before)
    assert stack.depth == 0
