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

from permafrost_engine_tpu.core import pickling as graphpickle
from permafrost_engine_tpu.core.config import EngineConfig
from permafrost_engine_tpu.state.schema import init_state

FORMAT_VERSION = 4


def engine_tokens(engine) -> dict[str, object]:
    """Engine-side singletons swapped for named tokens in the blob and
    re-bound to the freshly built engine at load. Script closures that
    captured e.g. the event bus keep working after a fresh-process load."""
    return {
        "ENGINE": engine, "BUS": engine.bus, "SCHED": engine.sched,
        "SETTINGS": engine.settings, "ECONOMY": engine.economy,
        "NAV": engine.nav, "REGIONS": engine.regions,
        "SELECTION": engine.selection, "ANIM": engine.anim,
        "AUDIO": engine.audio, "PERF": engine.perf,
    }


def _picklable(obj) -> bool:
    return graphpickle.picklable(obj)


def save_session_bytes(engine, *, script_state=None, extra_tokens=None,
                       by_value=None) -> bytes:
    """Serialize an Engine (game/engine.py) to bytes.

    Covers every subsystem's state the way the reference's subsession_save
    serializes per-subsystem entity streams (ref: src/session.c:176-233,
    src/game/game.c:3679-3713): device pytree, nav caches (flow + LOS),
    economy/garrison components, regions, selection, anim, audio, and
    scheduler tasks (live tasks resume mid-execution via replay logs).

    `script_state` (any object graph — the pf layer passes its whole
    context image) rides in the same GraphPickler stream as the host
    dict, so entity wrappers shared between task closures and event
    handlers keep one identity across the save (the reference gets this
    from pickling the whole interpreter in one pass, py_pickle.c).
    """
    engine.flush_deltas()   # no in-flight events may be lost in the blob
    state_bytes = flax.serialization.to_bytes(engine.state)
    tokens = {id(o): name for name, o in engine_tokens(engine).items()}
    for oid, name in (extra_tokens or {}).items():
        tokens[oid] = name

    def probe(rec):
        # serializability under the REAL save conditions: tokenized
        # engine singletons + the script-territory by-value policy
        return graphpickle.picklable(rec, tokens=tokens, by_value=by_value)

    eco = engine.economy
    host = {
        "frame": engine._frame,
        "sim_state": engine.sim_state,
        "economy_period": engine.economy_period,
        "drain_period": engine.drain_period,
        "seek_refresh_period": engine.seek_refresh_period,
        "next_uid": engine._next_uid,
        "free_slots": list(engine._free_slots),
        "uid_to_slot": dict(engine.uid_to_slot),
        "unit_type": dict(engine.unit_type),
        "slot_uid": engine._slot_uid,
        "free_flocks": list(engine._free_flocks),
        "gslot_owner": dict(engine._gslot_owner),
        "seek_flocks": dict(engine._seek_flocks),
        "chase_gslot": dict(engine._chase_gslot),
        "host_factions": set(engine._host_factions),
        "host_diplomacy": engine._host_diplomacy,
        "structures": dict(engine._structures),
        # nav: structure overlay + both caches + path tracking
        "nav_structure_ref": engine.nav.structure_ref,
        "nav_slot_mirror": engine.nav.slot_mirror,
        "nav_los_mirror": engine.nav.los_mirror,
        "nav_cache_order": list(engine.nav.flow_cache.order.items()),
        "nav_cache_free": list(engine.nav.flow_cache.free),
        "nav_los_order": list(engine.nav.los_cache.order.items()),
        "nav_los_free": list(engine.nav.los_cache.free),
        "nav_flock_chunks": dict(engine.nav.flock_chunks),
        "nav_flock_goal": dict(engine.nav.flock_goal),
        # the live-blocker host snapshot feeds field builds; restoring it
        # exactly keeps a loaded session's replans bit-identical to the
        # uninterrupted run
        "nav_blocker_snap": engine.nav._blocker_snap,
        "events": list(engine.events),
        # host subsystems (ref: G_SaveEntityState streams)
        "economy": {
            "resources": eco.resources, "harvesters": eco.harvesters,
            "storages": eco.storages, "buildings": eco.buildings,
            "builders": eco.builders, "garrisons": eco.garrisons,
            "population": eco.population,
            "resource_icons": eco.resource_icons,
        },
        "regions": engine.regions.regions,
        "selection": {
            "enabled": engine.selection.enabled,
            "selection": list(engine.selection.selection),
            "hovered": engine.selection.hovered,
        },
        "anim_states": engine.anim.states,
        "anim_models": {k: v for k, v in engine.anim.models.items()
                        if _picklable(v)},
        "audio": engine.audio.__dict__,
        # scheduler image: replayable tasks resume mid-execution via their
        # resume/effect logs; others restart from entry with their state
        # (ref: py_task.c:654 mid-execution fiber pickling)
        "sched": engine.sched.snapshot(probe=probe),
    }
    if hasattr(engine, "settings"):
        host["settings"] = engine.settings.snapshot()

    # boot (plain pickle): just enough to construct the Engine that the
    # graph-pickled part's tokens resolve against
    boot = {
        "cfg": engine.cfg.__dict__ if hasattr(engine.cfg, "__dict__")
               else dataclass_dict(engine.cfg),
        "nav_terrain_cost": engine.nav.terrain_cost,
        "map_data": engine.map_data,
    }
    rest = graphpickle.dumps({"host": host, "script": script_state},
                             tokens=tokens, by_value=by_value)
    buf = io.BytesIO()
    pickle.dump({"version": FORMAT_VERSION, "boot": boot,
                 "state": state_bytes, "rest": rest}, buf, protocol=4)
    return buf.getvalue()


def dataclass_dict(cfg: EngineConfig) -> dict:
    import dataclasses
    return dataclasses.asdict(cfg)


def load_session_bytes(data: bytes, *, extra_resolve=None,
                       return_script: bool = False):
    """Reconstruct an Engine from bytes; returns the new Engine (or
    `(engine, script_state)` with return_script=True).

    `extra_resolve(engine) -> dict[str, object]` supplies additional
    token bindings (the pf layer binds "CONTEXT" to its fresh context)."""
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.nav.service import LruSlab

    blob = pickle.loads(data)
    version = blob.get("version") or blob.get("host", {}).get("version")
    if version != FORMAT_VERSION:
        # older blobs can't restore anyway: the flax state schema changed
        # across versions, so from_bytes would raise on them — reject
        # with a clear error
        raise ValueError(
            f"unsupported session version {version} "
            f"(expected {FORMAT_VERSION}; the device-state schema is not "
            f"compatible across versions)")

    boot = blob["boot"]
    cfg = EngineConfig(**boot["cfg"])
    engine = Engine(cfg, cost_base=np.asarray(boot["nav_terrain_cost"]))
    if boot.get("map_data") is not None:
        # restores heights + the height-aware tick before state overwrite
        engine.load_map_data(boot["map_data"])
    template = init_state(cfg)
    engine.state = flax.serialization.from_bytes(template, blob["state"])

    resolve = {name: o for name, o in engine_tokens(engine).items()}
    for name, o in (extra_resolve(engine) if extra_resolve else {}).items():
        resolve[name] = o
    rest = graphpickle.loads(blob["rest"], resolve=resolve)
    host = rest["host"]
    script_state = rest.get("script")

    engine._frame = host.get("frame", 0)
    engine.sim_state = host.get("sim_state", 0)
    engine.economy_period = host.get("economy_period", engine.economy_period)
    engine.drain_period = host.get("drain_period", engine.drain_period)
    engine.seek_refresh_period = host.get(
        "seek_refresh_period", engine.seek_refresh_period)
    engine._next_uid = host["next_uid"]
    engine._free_slots = list(host["free_slots"])
    engine.uid_to_slot = dict(host["uid_to_slot"])
    engine.unit_type = {k: tuple(v)
                        for k, v in host.get("unit_type", {}).items()}
    engine._slot_uid = np.asarray(host["slot_uid"])
    engine._free_flocks = list(host["free_flocks"])
    engine._gslot_owner = dict(host.get("gslot_owner", {}))
    engine._seek_flocks = dict(host.get("seek_flocks", {}))
    engine._seek_created = {f: 0 for f in engine._seek_flocks}
    engine._sigs_inflight = None   # pre-load snapshots are meaningless
    engine._chase_gslot = dict(host.get("chase_gslot", {}))
    engine._host_factions = set(host.get("host_factions", set()))
    if "host_diplomacy" in host:
        engine._host_diplomacy = np.asarray(host["host_diplomacy"])
    engine._structures = dict(host.get("structures", {}))
    engine.events = list(host["events"])

    nav = engine.nav
    nav.structure_ref = np.asarray(host["nav_structure_ref"])
    nav._recompute_effective()
    nav.slot_mirror = np.asarray(host["nav_slot_mirror"])
    nav.los_mirror = np.asarray(host["nav_los_mirror"])
    cache = LruSlab(cfg.field_slab_slots)
    for k, v in host["nav_cache_order"]:
        cache.order[k] = v
    cache.free = list(host["nav_cache_free"])
    nav.flow_cache = cache
    los = LruSlab(cfg.los_slab_slots)
    for k, v in host["nav_los_order"]:
        los.order[k] = v
    los.free = list(host["nav_los_free"])
    nav.los_cache = los
    nav.flock_chunks = dict(host.get("nav_flock_chunks", {}))
    nav.flock_goal = dict(host.get("nav_flock_goal", {}))
    snap = host.get("nav_blocker_snap")
    nav._blocker_snap = None if snap is None else np.asarray(snap)

    # host subsystems
    if "economy" in host:
        eco = engine.economy
        for field, value in host["economy"].items():
            setattr(eco, field, value)
    if "regions" in host:
        engine.regions.regions = host["regions"]
    if "selection" in host:
        sel = host["selection"]
        engine.selection.enabled = sel["enabled"]
        engine.selection.selection = list(sel["selection"])
        engine.selection.hovered = sel["hovered"]
    if "anim_states" in host:
        engine.anim.states = host["anim_states"]
        engine.anim.models.update(host.get("anim_models", {}))
    if "audio" in host:
        engine.audio.__dict__.update(host["audio"])
    if "sched" in host:
        engine.sched.restore(host["sched"])
    else:   # legacy snapshots: restart-from-entry records
        for fn, args, name in host.get("sched_tasks", []):
            engine.sched.create(fn, *args, name=name)

    if "settings" in host and hasattr(engine, "settings"):
        engine.settings.restore(host["settings"])
    if return_script:
        return engine, script_state
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
