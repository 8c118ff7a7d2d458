"""Mid-execution task persistence via deterministic replay.

The reference pickles live fiber tasks mid-execution (ref:
/root/reference/src/script/py_task.c:654, py_pickle.c). CPython 3 cannot
pickle generator frames, so core/sched.py persists suspended tasks by
replaying their recorded resume/effect logs — these tests prove local
variables (not just the state dict) survive a save/load."""

import pickle

import numpy as np
import pytest

from permafrost_engine_tpu.core import sched as S
from permafrost_engine_tpu.core.events import EventBus


def counter_task(task, start):
    total = start            # LOCAL variable: only replay can restore it
    while True:
        msg, _sender = yield S.Receive()
        if msg == "stop":
            return total
        total += msg
        task.state["last_total"] = total


def test_replay_restores_local_variables():
    sched = Scheduler = S.Scheduler()
    tid = sched.create(counter_task, 100, name="counter")
    sched.tick()
    sched.send(tid, 7)
    sched.tick()
    sched.send(tid, 5)
    sched.tick()                      # total == 112, held in a LOCAL

    snap = pickle.loads(pickle.dumps(sched.snapshot(), protocol=4))
    s2 = S.Scheduler()
    resumed = s2.restore(snap)
    assert resumed == 1

    # continue where we left off: the local accumulator must be 112
    s2.send(tid, "stop")
    s2.tick()
    t = s2.tasks.get(tid)
    # task finished this tick; its result is captured before reaping
    assert t is None or t.status == 6
    # verify via a fresh stop on the original too
    sched.send(tid, "stop")
    sched.tick()
    # compare through state dict breadcrumbs
    assert snap["tasks"][0]["state"]["last_total"] == 112


def test_replay_result_continuity():
    """The restored task computes the same final result as the original."""
    sched = S.Scheduler()
    tid = sched.create(counter_task, 1000, name="c")
    sched.tick()
    for v in (3, 9, 27):
        sched.send(tid, v)
        sched.tick()

    snap = pickle.loads(pickle.dumps(sched.snapshot(), protocol=4))
    s2 = S.Scheduler()
    assert s2.restore(snap) == 1
    s2.send(tid, "stop")
    t = s2.tasks[tid]
    s2.tick()
    assert t.result == 1000 + 3 + 9 + 27


SIDE_EFFECTS = []


def effect_task(task):
    a = task.effect(SIDE_EFFECTS.append, "spawned")   # world mutation
    yield S.Yield()
    b = task.effect(len, SIDE_EFFECTS)
    task.state["len"] = b
    yield S.Receive()
    return b


def test_effects_execute_exactly_once_across_replay():
    SIDE_EFFECTS.clear()
    sched = S.Scheduler()
    tid = sched.create(effect_task, name="fx")
    sched.tick()
    sched.tick()
    assert SIDE_EFFECTS == ["spawned"]

    snap = pickle.loads(pickle.dumps(sched.snapshot(), protocol=4))
    s2 = S.Scheduler()
    assert s2.restore(snap) == 1
    # replay must NOT re-run the append
    assert SIDE_EFFECTS == ["spawned"]
    s2.send(tid, ("go",))
    t = s2.tasks[tid]
    s2.tick()
    assert t.result == 1                 # len recorded before the save


FLAKY_MODE = {"branch": False}


def flaky_task(task):
    if FLAKY_MODE["branch"]:
        yield S.Sleep(5)                 # different request on replay
    else:
        yield S.Yield()
    task.state["ran"] = task.state.get("ran", 0) + 1
    yield S.Receive()


def test_nondeterministic_task_falls_back_to_restart():
    FLAKY_MODE["branch"] = False
    sched = S.Scheduler()
    tid = sched.create(flaky_task, name="flaky")
    sched.tick()
    sched.tick()
    snap = pickle.loads(pickle.dumps(sched.snapshot(), protocol=4))

    FLAKY_MODE["branch"] = True          # world changed: replay diverges
    s2 = S.Scheduler()
    assert s2.restore(snap) == 0         # fell back to restart-from-entry
    t = s2.tasks[tid]
    assert t.status != 6                 # alive, restarted
    assert t.state.get("ran") == 1       # state dict still carried


def waiting_task(task):
    arg = yield S.AwaitEvent(777)
    task.state["woke"] = arg
    yield S.Receive()


def test_blocked_event_state_survives():
    sched = S.Scheduler(EventBus())
    tid = sched.create(waiting_task, name="w")
    sched.tick()
    snap = pickle.loads(pickle.dumps(sched.snapshot(), protocol=4))
    s2 = S.Scheduler(EventBus())
    assert s2.restore(snap) == 1
    s2.post_event(777, {"hello": 1})
    s2.tick()
    assert s2.tasks[tid].state["woke"] == {"hello": 1}


def spinner_task(task):
    while True:
        yield S.Yield()


def test_log_cap_degrades_to_restart():
    sched = S.Scheduler()
    tid = sched.create(spinner_task, name="spin")
    for _ in range(S.REPLAY_LOG_CAP + 5):
        sched.tick()
    t = sched.tasks[tid]
    assert not t.replayable and not t.resume_log
    snap = pickle.loads(pickle.dumps(sched.snapshot(), protocol=4))
    s2 = S.Scheduler()
    assert s2.restore(snap) == 0         # restart-from-entry record
    assert s2.alive(tid)


class QuestTask:
    """Defined at module level so the bound-method entry pickles (the
    same importability rule the reference's pickler has for classes)."""

    _base = None


def _quest_class():
    from permafrost_engine_tpu.script import pf
    if QuestTask._base is None:
        class Quest(pf.Task):
            def __run__(self):
                progress = 0             # local, not in self.state
                while progress < 3:
                    yield self.sleep(2)
                    progress += 1
                self.state["done_at"] = progress
                yield self.receive()
        Quest.__qualname__ = "Quest"
        QuestTask._base = Quest
        import sys
        setattr(sys.modules[__name__], "Quest", Quest)
    return QuestTask._base


def test_pf_task_mid_execution_through_session(tmp_path):
    """End-to-end: a pf.Task survives pf.save_session/load_session with
    its generator locals intact."""
    from permafrost_engine_tpu.core.config import EngineConfig
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.script import pf

    ctx = pf.context()
    old_eng, old_tasks = ctx.engine, dict(ctx.tasks)
    try:
        ctx.engine = Engine(EngineConfig(max_ents=8))
        ctx.basedir = str(tmp_path)
        Quest = _quest_class()

        q = Quest()
        for _ in range(5):               # partway through the quest
            ctx.engine.sched.tick()
        assert "done_at" not in q.state

        pf.save_session("quest.sav")
        pf.load_session("quest.sav")
        eng2 = ctx.engine
        q2 = ctx.tasks[q.tid]
        assert isinstance(q2, Quest) and q2 is not q
        for _ in range(6):               # finish the remaining sleeps
            eng2.sched.tick()
        assert q2.state["done_at"] == 3  # local `progress` was restored
    finally:
        ctx.engine = old_eng
        ctx.tasks = old_tasks
