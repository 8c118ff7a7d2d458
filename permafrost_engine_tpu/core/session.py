"""Session save/load: full-engine checkpoint and resume.

The reference serializes the entire engine session — global state, every
subsystem's entity streams, and the whole Python interpreter — through
self-describing attr records (ref: src/session.c:176-233, src/lib/public/
attr.h:44-73, py_pickle.c). The TPU engine's equivalent is radically
simpler because nearly all simulation state lives in one pytree of arrays:

  * device state -> flax.serialization bytes (one blob, exact)
  * host bookkeeping (uid<->slot maps, free lists, flock/field caches,
    settings, task states) -> a pickled dict
  * resumed sessions continue deterministically: the tick function is pure
    and the saved state includes tick counters, velocity histories and
    interpolation sources (the reference's determinism contract,
    SURVEY §5 checkpoint notes)

A subsession stack (exec_push/exec_pop, ref: session.h:58-60) is layered
on top by keeping saved blobs in memory.
"""

from __future__ import annotations

import io
import pickle

import flax.serialization
import numpy as np

from permafrost_engine_tpu.core.config import EngineConfig
from permafrost_engine_tpu.state.schema import init_state

FORMAT_VERSION = 1


def save_session_bytes(engine) -> bytes:
    """Serialize an Engine (game/engine.py) to bytes."""
    state_bytes = flax.serialization.to_bytes(engine.state)
    host = {
        "version": FORMAT_VERSION,
        "cfg": engine.cfg.__dict__ if hasattr(engine.cfg, "__dict__")
               else dataclass_dict(engine.cfg),
        "next_uid": engine._next_uid,
        "free_slots": list(engine._free_slots),
        "uid_to_slot": dict(engine.uid_to_slot),
        "free_flocks": list(engine._free_flocks),
        "nav_cost_base": engine.nav.cost_base,
        "map_data": engine.map_data,
        "nav_slot_mirror": engine.nav.slot_mirror,
        "nav_los_mirror": engine.nav.los_mirror,
        "nav_cache_order": list(engine.nav.flow_cache.order.items()),
        "nav_cache_free": list(engine.nav.flow_cache.free),
        "events": list(engine.events),
    }
    if hasattr(engine, "settings"):
        host["settings"] = engine.settings.snapshot()
    buf = io.BytesIO()
    pickle.dump({"host": host, "state": state_bytes}, buf, protocol=4)
    return buf.getvalue()


def dataclass_dict(cfg: EngineConfig) -> dict:
    import dataclasses
    return dataclasses.asdict(cfg)


def load_session_bytes(data: bytes):
    """Reconstruct an Engine from bytes; returns the new Engine."""
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.nav.service import LruSlab

    blob = pickle.loads(data)
    host = blob["host"]
    if host["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported session version {host['version']}")

    cfg = EngineConfig(**host["cfg"])
    engine = Engine(cfg, cost_base=np.asarray(host["nav_cost_base"]))
    if host.get("map_data") is not None:
        # restores heights + the height-aware tick before state overwrite
        engine.load_map_data(host["map_data"])
    template = init_state(cfg)
    engine.state = flax.serialization.from_bytes(template, blob["state"])

    engine._next_uid = host["next_uid"]
    engine._free_slots = list(host["free_slots"])
    engine.uid_to_slot = dict(host["uid_to_slot"])
    engine._free_flocks = list(host["free_flocks"])
    engine.events = list(host["events"])

    nav = engine.nav
    nav.slot_mirror = np.asarray(host["nav_slot_mirror"])
    if "nav_los_mirror" in host:
        nav.los_mirror = np.asarray(host["nav_los_mirror"])
    cache = LruSlab(cfg.field_slab_slots)
    for k, v in host["nav_cache_order"]:
        cache.order[k] = v
    cache.free = list(host["nav_cache_free"])
    nav.flow_cache = cache

    if "settings" in host and hasattr(engine, "settings"):
        engine.settings.restore(host["settings"])
    return engine


def save_session(engine, path: str) -> None:
    with open(path, "wb") as f:
        f.write(save_session_bytes(engine))


def load_session(path: str):
    with open(path, "rb") as f:
        return load_session_bytes(f.read())


class SubsessionStack:
    """exec_push/exec_pop semantics (ref: session.h:58-60): push saves the
    current session and starts a fresh one; pop restores."""

    def __init__(self):
        self._stack: list[bytes] = []

    def push(self, engine) -> None:
        self._stack.append(save_session_bytes(engine))

    def pop(self):
        if not self._stack:
            raise IndexError("subsession stack empty")
        return load_session_bytes(self._stack.pop())

    def pop_to_root(self):
        if not self._stack:
            raise IndexError("subsession stack empty")
        root = self._stack[0]
        self._stack.clear()
        return load_session_bytes(root)

    @property
    def depth(self) -> int:
        return len(self._stack)
