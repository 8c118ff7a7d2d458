"""Cooperative task scheduler: generator-based tasks with microkernel IPC.

The reference runs game logic in userspace fibers with a
Send/Receive/Reply IPC protocol, AwaitEvent integration with the event
bus, and a name server (ref: src/sched.c:155-178, src/sched.h:94-133,
src/task.h:51-70). The device does all the heavy lifting here, so tasks
are host-side Python generators that *yield request objects* — the same
request protocol, without assembly context switches:

    def my_task(task):
        msg, sender = yield Receive()
        yield Reply(sender, "ack")
        yield Sleep(30)          # 30 ticks
        ev = yield AwaitEvent(EventType.MOTION_END)

Determinism: tasks run in creation order each tick, a fixed quota per
tick. Tasks carry a `state` dict that session save persists (generators
themselves are not picklable in CPython — mid-execution fiber pickling,
ref py_task.c:654, is out of scope; tasks restart from their entry with
their persisted state on load).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Callable, Generator

from permafrost_engine_tpu.core.events import EventBus


# -- request protocol (ref: sched.h:120-133) -----------------------------------

@dataclasses.dataclass
class Yield:
    """Reschedule; resume next tick."""


@dataclasses.dataclass
class Sleep:
    ticks: int


@dataclasses.dataclass
class Send:
    to: int          # tid
    msg: Any


@dataclasses.dataclass
class Receive:
    """Block until a message arrives; yields (msg, sender_tid)."""


@dataclasses.dataclass
class Reply:
    to: int
    msg: Any


@dataclasses.dataclass
class AwaitEvent:
    event: int


@dataclasses.dataclass
class Register:
    name: str


@dataclasses.dataclass
class WhoIs:
    name: str        # yields tid or None


_RUNNING, _READY, _BLOCKED_RECV, _BLOCKED_REPLY, _BLOCKED_EVENT, _SLEEPING, _DONE = range(7)


class Task:
    def __init__(self, tid: int, fn: Callable, args: tuple, name: str | None):
        self.tid = tid
        self.fn = fn
        self.name = name or fn.__name__
        self.state: dict = {}           # picklable user state
        self.gen: Generator = fn(self, *args)
        self.status = _READY
        self.inbox: deque[tuple[Any, int]] = deque()
        self.reply_waiters: deque[int] = deque()   # tids awaiting our reply
        self.wake_tick = 0
        self.send_value: Any = None     # value passed into next resume
        self.result: Any = None


class Scheduler:
    """Deterministic cooperative scheduler (ref: src/sched.c)."""

    def __init__(self, events: EventBus | None = None, max_tasks: int = 8192):
        self.events = events
        self.max_tasks = max_tasks
        self.tasks: dict[int, Task] = {}
        self._next_tid = 1
        self._names: dict[str, int] = {}
        self._tick = 0
        self._event_waiters: dict[int, list[int]] = {}

    # -- task management ---------------------------------------------------------

    def create(self, fn: Callable, *args, name: str | None = None) -> int:
        if len(self.tasks) >= self.max_tasks:
            raise RuntimeError("task table full")
        tid = self._next_tid
        self._next_tid += 1
        self.tasks[tid] = Task(tid, fn, args, name)
        return tid

    def alive(self, tid: int) -> bool:
        return tid in self.tasks and self.tasks[tid].status != _DONE

    def send(self, tid: int, msg: Any, sender: int = 0) -> None:
        """Host -> task message injection."""
        t = self.tasks.get(tid)
        if t is None:
            return
        t.inbox.append((msg, sender))
        if t.status == _BLOCKED_RECV:
            t.status = _READY
            t.send_value = t.inbox.popleft()

    def post_event(self, event: int, arg: Any = None) -> None:
        """Wake tasks awaiting this event (wire the engine's event drain
        here; ref: Task_AwaitEvent, task.h:62)."""
        for tid in self._event_waiters.pop(int(event), []):
            t = self.tasks.get(tid)
            if t is not None and t.status == _BLOCKED_EVENT:
                t.status = _READY
                t.send_value = arg

    # -- the tick ------------------------------------------------------------------

    def tick(self, quota: int | None = None) -> int:
        """Run every ready task one step (requests are cheap; a task runs
        until it yields). Returns number of task resumptions."""
        self._tick += 1
        runs = 0
        for tid in sorted(self.tasks):
            t = self.tasks.get(tid)
            if t is None:
                continue
            if t.status == _SLEEPING and self._tick >= t.wake_tick:
                t.status = _READY
            while t.status == _READY:
                runs += 1
                if quota is not None and runs > quota:
                    return runs
                if not self._resume(t):
                    break
        # reap finished tasks
        for tid in [k for k, v in self.tasks.items() if v.status == _DONE]:
            t = self.tasks.pop(tid)
            if t.name in self._names and self._names[t.name] == tid:
                del self._names[t.name]
        return runs

    def _resume(self, t: Task) -> bool:
        """Advance a task one request. Returns True if it stays READY."""
        val, t.send_value = t.send_value, None
        try:
            req = t.gen.send(val)
        except StopIteration as e:
            t.result = getattr(e, "value", None)
            t.status = _DONE
            # release reply-waiters of a dead task
            for wtid in t.reply_waiters:
                w = self.tasks.get(wtid)
                if w and w.status == _BLOCKED_REPLY:
                    w.status = _READY
                    w.send_value = None
            return False

        if isinstance(req, Yield):
            t.status = _SLEEPING
            t.wake_tick = self._tick + 1
        elif isinstance(req, Sleep):
            t.status = _SLEEPING
            t.wake_tick = self._tick + max(1, req.ticks)
        elif isinstance(req, Send):
            target = self.tasks.get(req.to)
            if target is None:
                t.send_value = None     # send to dead task: None reply
                return True
            target.inbox.append((req.msg, t.tid))
            target.reply_waiters.append(t.tid)
            if target.status == _BLOCKED_RECV:
                target.status = _READY
                target.send_value = target.inbox.popleft()
            t.status = _BLOCKED_REPLY
        elif isinstance(req, Receive):
            if t.inbox:
                t.send_value = t.inbox.popleft()
                return True
            t.status = _BLOCKED_RECV
        elif isinstance(req, Reply):
            target = self.tasks.get(req.to)
            if target is not None and target.status == _BLOCKED_REPLY:
                target.status = _READY
                target.send_value = req.msg
            if req.to in t.reply_waiters:
                t.reply_waiters.remove(req.to)
            return True
        elif isinstance(req, AwaitEvent):
            t.status = _BLOCKED_EVENT
            self._event_waiters.setdefault(int(req.event), []).append(t.tid)
        elif isinstance(req, Register):
            self._names[req.name] = t.tid
            return True
        elif isinstance(req, WhoIs):
            t.send_value = self._names.get(req.name)
            return True
        else:
            raise TypeError(f"task {t.tid} yielded non-request {req!r}")
        return False
