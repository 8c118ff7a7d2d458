"""Host engine facade: entity registry, command issue, tick driving.

This is the analogue of the reference's main-thread game layer: scripts
talk to it (spawn, move, attack, query), it patches the device state
between ticks (the command-queue discipline, ref: src/game/movement.c:
371-395) and runs the jitted tick. UIDs map to arena slots host-side,
replacing the reference's uid-keyed khash tables.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    EngineConfig,
    EntityFlags,
    FIELD_RES,
    MoveState,
    NAV_TILE_SIZE,
    footprint_for_radius,
    nav_layer,
    NavDomain,
)
from permafrost_engine_tpu.core.events import EventBus, EventType
from permafrost_engine_tpu.core.perf import Perf
from permafrost_engine_tpu.core.sched import Scheduler
from permafrost_engine_tpu.core.settings import Settings
from permafrost_engine_tpu.game.step import make_tick, make_tick_scan
from permafrost_engine_tpu.nav.service import NavService
from permafrost_engine_tpu.state.schema import (GameState, empty_deltas,
                                                init_state)


import functools


@functools.partial(jax.jit, static_argnames=("f_n", "cr", "cc"))
def _chunk_sig_kernel(pos, alive, faction, *, f_n: int, cr: int, cc: int):
    """Per-(faction, chunk) presence signature i32[f_n, cr, cc]: folds the
    unit count and quantized tile positions, changing whenever any unit
    moves a tile / dies / spawns there (the per-faction blocker-count
    analogue, ref: nav_data.h:118-158)."""
    from permafrost_engine_tpu.core.config import FIELD_RES

    tile = (pos / NAV_TILE_SIZE).astype(jnp.int32)
    crd = jnp.clip(tile[:, 1] // FIELD_RES, 0, cr - 1)
    ccd = jnp.clip(tile[:, 0] // FIELD_RES, 0, cc - 1)
    f = jnp.clip(faction, 0, f_n - 1)
    idx = jnp.where(alive, f * (cr * cc) + crd * cc + ccd, f_n * cr * cc)
    counts = jnp.zeros((f_n * cr * cc + 1,), jnp.int32).at[idx].add(
        1, mode="drop")
    psum = jnp.zeros((f_n * cr * cc + 1,), jnp.int32).at[idx].add(
        tile[:, 0] + 8191 * tile[:, 1], mode="drop")
    sig = counts[:-1] * jnp.int32(1_000_003) + psum[:-1]
    return sig.reshape(f_n, cr, cc)


@jax.jit
def _spawn_write(e, sl, uids, faction, layers, pos, radius, sel_radius,
                 max_speed, hp, vision_range, attack_range, base_dmg,
                 armour_pc, attack_period, is_ranged, stance, flags):
    """All of spawn's per-entity writes as ONE jitted program: dispatched
    eagerly they are ~23 separate scatters, each compiling per batch
    shape (~0.45 s per op through the remote-compile relay — a novel
    spawn size cost ~8 s of interactive hitch; fused it is one compile)."""
    return e.replace(
        alive=e.alive.at[sl].set(True, mode="drop"),
        uid=e.uid.at[sl].set(uids, mode="drop"),
        flags=e.flags.at[sl].set(flags, mode="drop"),
        faction=e.faction.at[sl].set(faction, mode="drop"),
        layer=e.layer.at[sl].set(layers, mode="drop"),
        pos=e.pos.at[sl].set(pos, mode="drop"),
        prev_pos=e.prev_pos.at[sl].set(pos, mode="drop"),
        radius=e.radius.at[sl].set(radius, mode="drop"),
        sel_radius=e.sel_radius.at[sl].set(sel_radius, mode="drop"),
        max_speed=e.max_speed.at[sl].set(max_speed, mode="drop"),
        hp=e.hp.at[sl].set(hp, mode="drop"),
        max_hp=e.max_hp.at[sl].set(hp, mode="drop"),
        movestate=e.movestate.at[sl].set(MoveState.ARRIVED, mode="drop"),
        flock=e.flock.at[sl].set(-1, mode="drop"),
        vision_range=e.vision_range.at[sl].set(vision_range, mode="drop"),
        attack_range=e.attack_range.at[sl].set(attack_range, mode="drop"),
        base_dmg=e.base_dmg.at[sl].set(base_dmg, mode="drop"),
        armour_pc=e.armour_pc.at[sl].set(armour_pc, mode="drop"),
        attack_period=e.attack_period.at[sl].set(attack_period,
                                                 mode="drop"),
        is_ranged=e.is_ranged.at[sl].set(is_ranged, mode="drop"),
        stance=e.stance.at[sl].set(stance, mode="drop"),
        combatstate=e.combatstate.at[sl].set(0, mode="drop"),
        target=e.target.at[sl].set(-1, mode="drop"),
    )


@jax.jit
def _order_write(e, fl, sl, dests, flock_val, cells_on, fid, goal, layer):
    """All of a move order's entity + flock-table writes as ONE jitted
    program (the `_spawn_write` analogue for `_apply_move_result`):
    dispatched eagerly they are ~9 separate scatter/set ops, each
    compiling per pow2 batch shape (~0.45 s per op through the
    remote-compile relay) and each a separate dispatch per order."""
    e = e.replace(
        dest=e.dest.at[sl].set(dests, mode="drop"),
        formation_cell=e.formation_cell.at[sl].set(dests, mode="drop"),
        flock=e.flock.at[sl].set(flock_val, mode="drop"),
        movestate=e.movestate.at[sl].set(MoveState.MOVING, mode="drop"),
        has_formation_cell=e.has_formation_cell.at[sl].set(
            cells_on, mode="drop"),
    )
    fl = fl.replace(
        active=fl.active.at[fid].set(True),
        dest=fl.dest.at[fid].set(goal),
        layer=fl.layer.at[fid].set(layer),
        formation=fl.formation.at[fid].set(0),
    )
    return e, fl


@jax.jit
def _replan_write(e, fl, sl_dest, dests, sl_cell, cells_on, sl_fail, fids,
                  goals):
    """ALL flocks' replan writes after a batched path re-request as ONE
    jitted program: a structure drop replanning 20 flocks previously paid
    ~4 eager scatter compiles/dispatches per flock (the 'per-order write
    compiles at novel selection sizes' residue of the r4 storm work).
    Row conventions: `sl_dest`/`dests` update destinations for every
    replanned member; `sl_cell` repeats `sl_dest` with single-member
    flocks' rows replaced by the out-of-bounds sentinel (mode='drop'
    skips them — their formation-cell state must not change); `sl_fail`
    lists members of now-unreachable flocks (flock -> -1); `fids`/`goals`
    update the flock table (sentinel-padded)."""
    e = e.replace(
        dest=e.dest.at[sl_dest].set(dests, mode="drop"),
        formation_cell=e.formation_cell.at[sl_cell].set(dests, mode="drop"),
        has_formation_cell=e.has_formation_cell.at[sl_cell].set(
            cells_on, mode="drop"),
        flock=e.flock.at[sl_fail].set(-1, mode="drop"),
    )
    fl = fl.replace(dest=fl.dest.at[fids].set(goals, mode="drop"))
    return e, fl


def _pad_slots(slots: np.ndarray, sentinel: int) -> np.ndarray:
    """Pad a slot-index vector to the next power of two with `sentinel`
    (an out-of-bounds slot index: every batch write uses mode='drop', so
    padding rows are ignored). Eager `.at[slots].set` updates compile PER
    BATCH SHAPE — through the remote-compile relay each novel size costs
    ~0.45 s per scatter/glue op, so a 6-building mid-fight spawn measured
    an ~8 s interactive hitch from ~23 such compiles. Pow2-bucketed
    shapes make batch-write compiles a log-bounded load-time cost."""
    m = len(slots)
    m_pad = 1 << (max(m, 1) - 1).bit_length()
    out = np.full((m_pad,), sentinel, np.int32)
    out[:m] = slots
    return out


@functools.partial(jax.jit, static_argnames=("f_n", "cr", "cc"))
def _flock_chunk_occupancy(pos, alive, flock, *, f_n: int, cr: int, cc: int):
    """bool[max_flocks, num_chunks]: chunks each flock's living members
    currently occupy — drives on-demand field extension for strays
    (ref: fieldcache.c:59-102 per-chunk on-demand field requests)."""
    from permafrost_engine_tpu.core.config import FIELD_RES

    tile = (pos / NAV_TILE_SIZE).astype(jnp.int32)
    crd = jnp.clip(tile[:, 1] // FIELD_RES, 0, cr - 1)
    ccd = jnp.clip(tile[:, 0] // FIELD_RES, 0, cc - 1)
    ok = alive & (flock >= 0)
    idx = jnp.where(ok, jnp.clip(flock, 0, f_n - 1) * (cr * cc)
                    + crd * cc + ccd, f_n * cr * cc)
    occ = jnp.zeros((f_n * cr * cc + 1,), jnp.bool_).at[idx].set(
        True, mode="drop")
    return occ[:-1].reshape(f_n, cr * cc)


@functools.partial(jax.jit, static_argnames=("f_n", "l_n"))
def _faction_layer_counts(alive, hp, faction, layer, *, f_n: int, l_n: int):
    """LIVING-unit counts per (faction, nav layer) i32[f_n, l_n] — drives
    which layers get per-layer chase fields (ref: field.c:1209-1678
    builds enemy-seek per layer). Corpses (alive until decay, hp<=0)
    don't chase, so they don't hold fields."""
    f = jnp.clip(faction, 0, f_n - 1)
    l = jnp.clip(layer, 0, l_n - 1)
    idx = jnp.where(alive & (hp > 0), f * l_n + l, f_n * l_n)
    return jnp.zeros((f_n * l_n + 1,), jnp.int32).at[idx].add(
        1, mode="drop")[:-1].reshape(f_n, l_n)


class Engine:
    def __init__(self, cfg: EngineConfig | None = None, *, seed: int = 0,
                 cost_base: np.ndarray | None = None):
        self.cfg = cfg or EngineConfig()
        self.state: GameState = init_state(self.cfg, seed=seed)
        if cost_base is not None:
            self.set_cost_base(cost_base)
        else:
            cost_base = np.ones(
                (self.cfg.num_layers, self.cfg.field_h, self.cfg.field_w),
                np.uint8)
        self.nav = NavService(self.cfg, cost_base)
        # device skinning (cfg.skin_joints > 0): the tick rebuilds the
        # full [N, J, 4, 4] palette array at render cadence (ops/skin.py).
        # Starts on the procedural rig; set_skin_bank() swaps in a real
        # model's clips (ops/skin.bank_from_pfobj).
        if self.cfg.skin_joints > 0:
            from permafrost_engine_tpu.ops.skin import make_procedural_bank
            self._skin_bank = make_procedural_bank(self.cfg.skin_joints)
        else:
            self._skin_bank = None
        self._tick_fn = make_tick(self.cfg, skin_bank=self._skin_bank)
        self._scan_fn = None
        # micro-batched interactive stepping: step() fuses the frames up to
        # the next host-cadence boundary into ONE device dispatch (k -> fn)
        self._micro_fns: dict[int, object] = {}
        self._tick_fn_nodonate = None
        self.micro_batching = True
        self._next_uid = 1
        self._free_slots = list(range(self.cfg.max_ents - 1, -1, -1))
        self.uid_to_slot: dict[int, int] = {}
        # per-uid (formation_priority, type_key) for subformation grouping
        # (ref: Entity_TypeID + S_FormationPriority, py_script.c:4746-4784;
        # the pf entity layer registers the script class here, engine-level
        # spawns pass unit_type= to spawn_batch)
        self.unit_type: dict[int, tuple] = {}
        # host mirror of ents.uid: the drain path must never fetch the uid
        # array from device (each device->host sync drains the dispatch
        # pipeline through the remote transport)
        self._slot_uid = np.zeros(self.cfg.max_ents, np.int64)
        self._free_flocks = list(range(self.cfg.max_flocks - 1, -1, -1))
        self.events: list[tuple[str, dict]] = []

        # host subsystems (imported late to avoid cycles)
        from permafrost_engine_tpu.game.economy import Economy
        from permafrost_engine_tpu.game.region import RegionSystem
        from permafrost_engine_tpu.game.selection import SelectionSystem

        from permafrost_engine_tpu.core.audio import AudioSystem
        from permafrost_engine_tpu.render.anim_system import AnimSystem

        self.bus = EventBus()
        # pf.debug.trace_python / log_python: record script handler
        # dispatches into bus.trace_log while either setting is on
        self.bus.trace_pred = (
            lambda: self._debug_flag("trace_python")
            or self._debug_flag("log_python"))
        # pf.debug.log_call_graphs / log_mem_stats ring buffers
        from collections import deque as _deque
        self.call_graph_log: "deque" = _deque(maxlen=16)
        self.mem_stats_log: "deque" = _deque(maxlen=8)
        self.sched = Scheduler(self.bus)
        self.perf = Perf()
        self.settings = Settings()
        self.economy = Economy(self)
        self.regions = RegionSystem(self.bus)
        self.selection = SelectionSystem(self.bus)
        self.audio = AudioSystem()
        self.anim = AnimSystem(self)
        self.map_data = None
        self.heights = np.zeros((self.cfg.field_h, self.cfg.field_w), np.float32)
        self.sim_state = 0  # SimState.RUNNING
        self.economy_period = 12   # frames between economy ticks (~5 Hz)
        self._frame = 0
        # the device-resident TickDeltas accumulator the tick folds every
        # frame's events into (one dispatch per frame); swapped for a fresh
        # empty one at each drain boundary
        self._make_empty = jax.jit(functools.partial(empty_deltas, self.cfg))
        self._acc = self._make_empty()
        self._inflight_deltas = None  # async host copy started, not yet read
        self.drain_period = 6      # frames between event fetches (~100 ms)
        self._seek_flocks: dict[int, tuple] = {}
        self._seek_created: dict[int, int] = {}  # fid -> frame registered
        # pipelined (sigs, flock_active) snapshot: the cadence handler
        # consumes the async copy STARTED last cadence instead of stalling
        # the dispatch pipeline on a fresh synchronous fetch
        self._sigs_inflight = None
        # per-field snapshots of the per-faction chunk signatures (the
        # blocker-count invalidation state, ref: nav_data.h:118-158)
        self._field_sigs: dict = {}
        # blocker-edge flips at battle contact happen EVERY cadence (the
        # arrived crowd stamps blockers); uncapped they replan whole 5000-
        # unit flocks each period — a measured 30x fps collapse. Structure
        # commits are never rate-limited, only blocker-driven replans.
        self._blocker_replan_frame: dict[int, int] = {}
        self._nav_version = 0
        self._diplo_version = 0   # bumped on set_diplomacy: a new war must
                                  # rebuild seek fields even if nobody moved
        self.seek_refresh_period = 30  # frames between seek-field rebuilds
        # global-field slot ownership: gslot -> flock id, insertion-ordered
        # so eviction is FIFO when the slab is full (two live flocks must
        # never share a slot — the loser's units would follow the winner's
        # field)
        self._gslot_owner: dict[int, int] = {}
        # structure cutouts by uid -> stamped tile rect (r0, r1, c0, c1)
        self._structures: dict[int, tuple[int, int, int, int]] = {}
        # host mirrors of faction state (no device fetches on hot paths)
        self._host_factions: set[int] = set()
        self._host_diplomacy = np.zeros(
            (self.cfg.max_factions, self.cfg.max_factions), np.int32)
        # per-(faction, nav layer) combat-chase field slots (enemy-seek
        # global fields on each occupied layer's dilated costs)
        self._chase_gslot: dict[tuple[int, int], int] = {}

    # -- map -------------------------------------------------------------------

    def set_cost_base(self, cost_base: np.ndarray) -> None:
        """Install static per-layer terrain nav costs (u8[L, H, W]). Every
        nav derivative (portal graphs, islands, cached fields) is dropped
        and live flocks replan against the new world."""
        assert cost_base.shape == (
            self.cfg.num_layers, self.cfg.field_h, self.cfg.field_w)
        if hasattr(self, "nav"):
            self.nav.set_terrain(cost_base)
            self.state = self.state.replace(nav=self.state.nav.replace(
                cost_base=jnp.asarray(self.nav.cost_base)))
            # every cached field was dropped: push the scrubbed tables
            self.state = self.state.replace(flocks=self.state.flocks.replace(
                field_slot=jnp.asarray(self.nav.slot_mirror, jnp.int32),
                los_slot=jnp.asarray(self.nav.los_mirror, jnp.int32)))
            self._replan_flocks(None)
        else:
            self.state = self.state.replace(
                nav=self.state.nav.replace(cost_base=jnp.asarray(cost_base)))

    # -- dynamic structures (ref: N_CutoutStaticObject nav.c:3326,
    #    N_Update nav.c:2119-2206) ------------------------------------------------

    def set_structure_blocking(self, uid: int, blocking: bool = True) -> None:
        """Cut a building's footprint into (or out of) the static nav cost.
        Stamps are cheap and accumulate; the world update (cost push, portal
        graph / island rebuild, field invalidation, flock replans) commits
        once at the next frame boundary or order — the dynamic-world update
        the reference runs each movement tick
        (ref: nav.c:2119-2206, fieldcache.h:53-167)."""
        cur = self._structures.get(uid)
        if blocking and cur is None:
            slot = self.uid_to_slot[uid]
            pos = np.asarray(self.state.ents.pos)[slot]
            rad = float(np.asarray(self.state.ents.radius)[slot])
            rect = (int((pos[1] - rad) // NAV_TILE_SIZE),
                    int((pos[1] + rad) // NAV_TILE_SIZE),
                    int((pos[0] - rad) // NAV_TILE_SIZE),
                    int((pos[0] + rad) // NAV_TILE_SIZE))
            self._structures[uid] = rect
            self.nav.stamp_structure(rect, +1)
        elif not blocking and cur is not None:
            del self._structures[uid]
            self.nav.stamp_structure(cur, -1)

    def _commit_nav(self) -> None:
        """Apply pending structure stamps and replan affected flocks."""
        state, dirty = self.nav.commit_structures(self.state)
        if dirty is not None:
            self.state = state
            self._nav_version += 1        # cost edits invalidate seek fields
            self._replan_flocks(dirty)

    def _goal_chunk_hood(self, fid: int) -> set[int]:
        """The flock's goal chunk — where its own crowd parks."""
        info = self.nav.flock_goal.get(fid)
        if info is None:
            return set()
        _layer, (gr, gc) = info
        return {self.nav._chunk_idx(gr // FIELD_RES, gc // FIELD_RES)}

    def _replan_flocks(self, dirty: set[int] | None,
                       only_fids: set[int] | None = None) -> set[int]:
        """Re-request paths for flocks whose installed path crosses dirty
        chunks (None = every flock), ALL in one batched request — a
        structure commit replanning 20 flocks costs the same device
        dispatches as replanning one. The through-chunk half of the
        reference's cache invalidation (ref: fieldcache.h:53-167).
        Returns the set of flock ids replanned."""
        active = np.asarray(self.state.flocks.active)
        if not active.any():
            return set()
        flock = np.asarray(self.state.ents.flock)
        alive = np.asarray(self.state.ents.alive)
        pos = np.asarray(self.state.ents.pos)
        layers = np.asarray(self.state.flocks.layer)
        dests = np.asarray(self.state.flocks.dest)
        reqs, members_of = [], {}
        for fid in np.nonzero(active)[0]:
            fid = int(fid)
            chunks = self.nav.flock_chunks.get(fid)
            if chunks is None:     # seek/surround flocks: timer-refreshed
                continue
            if dirty is not None and not (chunks & dirty):
                continue
            if only_fids is not None and fid not in only_fids:
                continue
            members = np.nonzero(alive & (flock == fid))[0]
            if members.size == 0:
                continue
            members_of[fid] = members
            start = tuple(pos[members].mean(axis=0))
            reqs.append((fid, start, tuple(dests[fid]), int(layers[fid])))
        if not reqs:
            return set()
        self.state, results = self.nav.request_paths(self.state, reqs)
        # collect every flock's writes, then apply them in ONE jitted
        # dispatch (_replan_write): member sets are disjoint and flock ids
        # distinct, so the batch is exactly the old sequential applies
        n_ents = self.cfg.max_ents
        sl_dest, dest_rows, sl_cell, cell_rows = [], [], [], []
        fail_sl, fids_upd, goals_upd = [], [], []
        for (fid, _start, goal, layer), (ok, eff) in zip(reqs, results):
            members = members_of[fid]
            if ok:
                # unchanged effective goal (the common replan: same dest,
                # fresh fields around the new obstacle): members keep
                # their ring slots / cells — reassigning them every replan
                # churns a settling crowd into permanent motion
                if np.linalg.norm(np.asarray(eff) - np.asarray(goal)) < 1.0:
                    continue
                g = np.asarray(eff, np.float32)
                sl_dest.append(members.astype(np.int32))
                if members.size > 1:
                    ring, cells_on = self._ring_dests(
                        members, eff, int(layers[fid]))
                    dest_rows.append(np.asarray(ring, np.float32))
                    sl_cell.append(members.astype(np.int32))
                    cell_rows.append(
                        np.full(members.size, bool(cells_on)))
                else:
                    dest_rows.append(g[None, :])
                    # single-member replans only retarget dest; their
                    # formation-cell state is preserved (sentinel rows)
                    sl_cell.append(np.full(members.size, n_ents, np.int32))
                    cell_rows.append(np.zeros(members.size, bool))
                fids_upd.append(fid)
                goals_upd.append(g)
            else:
                # now unreachable: drop the flock; members direct-seek and
                # the stuck counter settles them (get-as-close semantics)
                fail_sl.append(members.astype(np.int32))
        if sl_dest or fail_sl:
            sd = (np.concatenate(sl_dest) if sl_dest
                  else np.zeros(0, np.int32))
            sd_p = _pad_slots(sd, n_ents)
            m = len(sd_p)
            dr_p = np.zeros((m, 2), np.float32)
            sc_p = np.full(m, n_ents, np.int32)
            cr_p = np.zeros(m, bool)
            if sl_dest:
                dr = np.concatenate(dest_rows)
                dr_p[:len(dr)] = dr
                sc_p[:len(sd)] = np.concatenate(sl_cell)
                cr_p[:len(sd)] = np.concatenate(cell_rows)
            fs_p = _pad_slots(
                np.concatenate(fail_sl) if fail_sl
                else np.zeros(0, np.int32), n_ents)
            fids_p = _pad_slots(np.asarray(fids_upd, np.int32),
                                self.cfg.max_flocks)
            gl_p = np.zeros((len(fids_p), 2), np.float32)
            if goals_upd:
                gl_p[:len(goals_upd)] = np.stack(goals_upd)
            e, fl = _replan_write(
                self.state.ents, self.state.flocks,
                jnp.asarray(sd_p), jnp.asarray(dr_p), jnp.asarray(sc_p),
                jnp.asarray(cr_p), jnp.asarray(fs_p),
                jnp.asarray(fids_p), jnp.asarray(gl_p))
            self.state = self.state.replace(ents=e, flocks=fl)
        return set(members_of)

    def load_map_data(self, map_data) -> None:
        """Install a parsed PFMAP: compile nav costs + heights
        (ref: AL_MapFromPFMapStream + N_NewCtxForMapData)."""
        from permafrost_engine_tpu.assets.pfmap import compile_nav_costs

        if (map_data.chunks_r, map_data.chunks_c) != (
                self.cfg.chunks_r, self.cfg.chunks_c):
            raise ValueError(
                f"map is {map_data.chunks_r}x{map_data.chunks_c} chunks; "
                f"engine config is {self.cfg.chunks_r}x{self.cfg.chunks_c}")
        cost, heights = compile_nav_costs(map_data)
        # configs may materialise fewer nav layers (tests: ground 1x1 only)
        cost = cost[:self.cfg.num_layers]
        self.map_data = map_data
        self.heights = heights
        self.set_cost_base(cost)
        # rebuild the tick so every compiled stepper (k==1, fused, scan)
        # closes over the SAME tile_height — an uneven->flat reload must
        # not leave height-aware closures behind (live-editor load path)
        if np.ptp(heights) > 0.5:
            th = jnp.asarray(heights[::2, ::2].astype(np.float32))
        else:
            th = None
        self._tile_height = th
        self._tick_fn = make_tick(self.cfg, th, skin_bank=self._skin_bank)
        self._scan_fn = None
        self._micro_fns = {}
        self._tick_fn_nodonate = None

    def set_skin_bank(self, bank) -> None:
        """Swap the device-skinning rig (ops/skin.SkinBank built from a
        pfobj's clips or a procedural one) and rebuild every compiled
        stepper around it. Requires cfg.skin_joints matching the rig."""
        if self.cfg.skin_joints <= 0:
            raise ValueError("cfg.skin_joints is 0: device skinning is off")
        j = len(bank.parents)
        if j != self.cfg.skin_joints:
            raise ValueError(
                f"bank has {j} joints; cfg.skin_joints={self.cfg.skin_joints}")
        self._skin_bank = bank
        self._tick_fn = make_tick(
            self.cfg, getattr(self, "_tile_height", None), skin_bank=bank)
        self._scan_fn = None
        self._micro_fns = {}
        self._tick_fn_nodonate = None

    def height_at(self, xz) -> float:
        from permafrost_engine_tpu.core.config import NAV_TILE_SIZE
        r = int(np.clip(xz[1] // NAV_TILE_SIZE, 0, self.cfg.field_h - 1))
        c = int(np.clip(xz[0] // NAV_TILE_SIZE, 0, self.cfg.field_w - 1))
        return float(self.heights[r, c])

    # -- spawning ---------------------------------------------------------------

    def spawn_batch(
        self,
        pos: np.ndarray,                # f32[M,2]
        faction: np.ndarray | int = 0,
        *,
        radius: float | np.ndarray = 1.0,
        sel_radius: float | np.ndarray | None = None,
        max_speed: float | np.ndarray = 10.0,
        hp: float | np.ndarray = 100.0,
        flags: int = (EntityFlags.COLLISION | EntityFlags.MOVABLE
                      | EntityFlags.SELECTABLE | EntityFlags.COMBATABLE),
        domain: NavDomain = NavDomain.GROUND,
        vision_range: float | np.ndarray = 60.0,
        attack_range: float | np.ndarray = 10.0,
        base_dmg: float | np.ndarray = 10.0,
        armour_pc: float | np.ndarray = 0.0,
        attack_period: int | np.ndarray = 10,
        is_ranged: bool | np.ndarray = False,
        stance: int | np.ndarray = 0,
        unit_type: int | np.ndarray = 0,
        formation_priority: int | np.ndarray = 0,
    ) -> list[int]:
        """Spawn M entities in one device update; returns their UIDs."""
        m = pos.shape[0]
        if len(self._free_slots) < m:
            raise RuntimeError("entity arena full")
        slots = np.array([self._free_slots.pop() for _ in range(m)], np.int32)
        uids = np.arange(self._next_uid, self._next_uid + m, dtype=np.int32)
        self._next_uid += m
        for u, s in zip(uids, slots):
            self.uid_to_slot[int(u)] = int(s)
        self._slot_uid[slots] = uids
        types = np.broadcast_to(np.asarray(unit_type), (m,))
        prios = np.broadcast_to(np.asarray(formation_priority), (m,))
        for u, t, p in zip(uids, types, prios):
            self.unit_type[int(u)] = (int(p), int(t))

        # batch writes pad to pow2 shapes (see _pad_slots): padding rows
        # carry the sentinel slot and are dropped by mode="drop"
        slots_p = _pad_slots(slots, self.cfg.max_ents)
        m_pad = len(slots_p)

        def bc(v, dtype=np.float32):
            a = np.zeros((m_pad,), dtype)
            a[:m] = np.broadcast_to(np.asarray(v, dtype), (m,))
            return a

        radius_arr = bc(radius)
        layers = np.array(
            [nav_layer(domain, footprint_for_radius(float(r)))
             for r in radius_arr], np.int32)
        pos_p = np.zeros((m_pad, 2), np.float32)
        pos_p[:m] = pos.astype(np.float32)
        uids_p = np.zeros((m_pad,), np.int32)
        uids_p[:m] = uids

        e = _spawn_write(
            self.state.ents, jnp.asarray(slots_p), jnp.asarray(uids_p),
            jnp.asarray(bc(faction, np.int32)), jnp.asarray(layers),
            jnp.asarray(pos_p), jnp.asarray(radius_arr),
            jnp.asarray(bc(sel_radius if sel_radius is not None
                           else radius)),
            jnp.asarray(bc(max_speed)), jnp.asarray(bc(hp)),
            jnp.asarray(bc(vision_range)), jnp.asarray(bc(attack_range)),
            jnp.asarray(bc(base_dmg)), jnp.asarray(bc(armour_pc)),
            jnp.asarray(bc(attack_period, np.int32)),
            jnp.asarray(bc(is_ranged, bool)),
            jnp.asarray(bc(stance, np.int32)),
            jnp.asarray(bc(flags, np.uint32)))
        self.state = self.state.replace(ents=e)
        return [int(u) for u in uids]

    def despawn(self, uid: int) -> None:
        if uid in self._structures:
            self.set_structure_blocking(uid, False)
        self.unit_type.pop(uid, None)
        slot = self.uid_to_slot.pop(uid)
        e = self.state.ents
        self.state = self.state.replace(
            ents=e.replace(alive=e.alive.at[slot].set(False)))
        self._free_slots.append(slot)

    # -- commands ----------------------------------------------------------------

    def move(self, uids: list[int], goal_xz: tuple[float, float],
             domain: NavDomain = NavDomain.GROUND) -> bool:
        """Order units to a destination: split the selection into per-layer
        flocks (ref: split_into_layers, movement.c:771-787), plan every
        layer's path in ONE batched request, install flow fields
        (ref: G_Move_SetDest -> make_flocks -> N_RequestPath,
        movement.c:4717, 930)."""
        if not uids:
            return False
        self._commit_nav()   # orders must see pending structure stamps
        # a fresh order must see live unit blockers (parked-unit plugs flip
        # portal-edge states, ref: nav.c:655-693); when no path flock was
        # alive the pipelined cadence snapshot is missing/stale, so sync it
        # here — event-rate, like the path request's own integrations
        if self.nav._blocker_snap is None or not self.nav.flock_chunks:
            self.nav.update_blockers(np.asarray(self.state.nav.blockers))
        slots = np.array([self.uid_to_slot[u] for u in uids], np.int32)
        layers = np.asarray(self.state.ents.layer)[slots]
        all_pos = np.asarray(self.state.ents.pos)

        groups, reqs = [], []
        for layer in np.unique(layers):
            group = slots[layers == layer]
            guids = [u for u, l in zip(uids, layers) if l == layer]
            if not self._free_flocks:
                self._reclaim_flocks()
            if not self._free_flocks:
                raise RuntimeError("flock table full")
            fid = self._free_flocks.pop()
            start = tuple(all_pos[group].mean(axis=0))
            groups.append((guids, group, int(layer), fid))
            reqs.append((fid, start, goal_xz, int(layer)))

        self.state, results = self.nav.request_paths(self.state, reqs)
        ok_any = False
        for (guids, group, layer, fid), (ok, eff_goal) in zip(groups,
                                                              results):
            self._apply_move_result(guids, group, goal_xz, layer, fid, ok,
                                    eff_goal)
            if ok:
                self._extend_stray_chunks(fid, all_pos[group])
            ok_any |= ok
        return ok_any

    def _extend_stray_chunks(self, fid: int, gpos: np.ndarray) -> None:
        """Members spread across chunks off the planned path (the path
        starts at the CENTROID's chunk) get on-demand fields now — without
        them they direct-seek and wedge on walls."""
        occ = {self.nav._chunk_idx(
            int(np.clip(p[1] // NAV_TILE_SIZE, 0,
                        self.cfg.field_h - 1)) // FIELD_RES,
            int(np.clip(p[0] // NAV_TILE_SIZE, 0,
                        self.cfg.field_w - 1)) // FIELD_RES)
            for p in gpos}
        missing = [c for c in occ if self.nav.slot_mirror[fid, c] < 0]
        if missing:
            self.state = self.nav.extend_fields(self.state, fid, missing)

    def _ring_dests(self, slots: np.ndarray, goal_xz, layer: int):
        """Per-unit packed ring-slot destinations around the goal
        (ref: arrival.h ring fill). Returns (f32[M,2] jnp dests, True)."""
        from permafrost_engine_tpu.core.config import ARRIVAL_THRESHOLD
        from permafrost_engine_tpu.game.arrival import assign_ring_slots

        pos = np.asarray(self.state.ents.pos)[slots]
        radius = np.asarray(self.state.ents.radius)[slots]
        spacing = max(float(radius.max()) * 3.0, ARRIVAL_THRESHOLD + 1.0)
        dests = assign_ring_slots(
            pos, np.asarray(goal_xz, np.float32), spacing,
            self.nav.cost_base[layer])
        return np.asarray(dests, np.float32), True

    def _apply_move_result(self, uids: list[int], slots: np.ndarray,
                           goal_xz: tuple[float, float], layer: int,
                           fid: int, ok: bool,
                           eff_goal: tuple[float, float]) -> bool:
        """Flock setup + events after a (possibly batched) path request."""
        goal = np.asarray(eff_goal if ok else goal_xz, np.float32)
        slots_p = _pad_slots(slots, self.cfg.max_ents)
        dests_p = np.zeros((len(slots_p), 2), np.float32)
        if ok and len(uids) > 1:
            # per-unit ring arrival slots (ref: arrival.h:49-120): the
            # flock shares flow fields to the goal; each unit settles onto
            # its own packed ring slot
            ring, cells_on = self._ring_dests(slots, eff_goal, layer)
            dests_p[:len(slots)] = ring
        else:
            dests_p[:len(slots)] = goal
            cells_on = False
        e, fl = _order_write(
            self.state.ents, self.state.flocks, jnp.asarray(slots_p),
            jnp.asarray(dests_p), np.int32(fid if ok else -1),
            bool(cells_on), np.int32(fid), jnp.asarray(goal),
            np.int32(layer))
        self.state = self.state.replace(ents=e, flocks=fl)
        # same event surface as device-side motion starts (_drain.emit):
        # events log + global + per-uid bus channels + scheduler waiters
        for u in uids:
            payload = {"uid": int(u)}
            self.events.append(("motion_start", payload))
            self.bus.notify(EventType.MOTION_START, payload)
            self.bus.notify(EventType.MOTION_START, payload, uid=int(u))
            self.sched.post_event(EventType.MOTION_START, payload)
        return ok

    def move_in_formation(self, uids: list[int], goal_xz: tuple[float, float],
                          ftype=None) -> bool:
        """Move order with formation cells: per-layer SUBFORMATION blocks
        stacked back from the goal, each laid out against terrain,
        occupancy (parked blockers) and island reachability, with the
        unit->cell assignment solved on device. Units share their layer
        flock's flow fields and arrive-steer onto their own cells
        (ref: G_Formation_Arrange + subformations + occupancy/island
        fields, formation.c:354, 450-980)."""
        from permafrost_engine_tpu.core.config import ARRIVAL_THRESHOLD
        from permafrost_engine_tpu.game.formation import (
            FormationType, assign_cells, block_depth, layout_cells)

        if ftype is None:
            ftype = FormationType.RANK
        if not uids:
            return False
        self._commit_nav()
        slots = np.array([self.uid_to_slot[u] for u in uids], np.int32)
        all_pos = np.asarray(self.state.ents.pos)
        all_rad = np.asarray(self.state.ents.radius)
        layers = np.asarray(self.state.ents.layer)[slots]
        goal = np.asarray(goal_xz, np.float32)
        centroid = all_pos[slots].mean(axis=0)
        direction = goal - centroid
        if np.linalg.norm(direction) < 1e-3:
            direction = np.array([1.0, 0.0], np.float32)
        d_unit = direction / np.linalg.norm(direction)

        # per-layer flocks + shared fields toward the goal (may retarget)
        ok = self.move(uids, tuple(goal))
        if not ok:
            return False
        # each layer group forms at its flock's EFFECTIVE destination —
        # a cross-island goal retargets to the reachable side, and cells
        # must be laid (and island-gated) there, not at the raw goal
        flock_of = np.asarray(self.state.ents.flock)
        flock_dest = np.asarray(self.state.flocks.dest)

        # occupancy = parked blockers, minus the ordered units' own stamps
        # (the reference excludes the formation's members from its
        # occupancy field)
        own_r = np.clip((all_pos[slots, 1] / NAV_TILE_SIZE).astype(int),
                        0, self.cfg.field_h - 1)
        own_c = np.clip((all_pos[slots, 0] / NAV_TILE_SIZE).astype(int),
                        0, self.cfg.field_w - 1)
        blockers_all = np.asarray(self.state.nav.blockers)
        depth_off = 0.0
        any_cells = False
        slot_uid = {s: u for u, s in zip(uids, slots.tolist())}
        # subformations: one block per (nav layer, unit type), stacked back
        # from the goal — the reference chains a subformation per distinct
        # entity type, sorted by (script formation_priority, type id), each
        # with its own spacing from that type's radius (ref: formation.c:
        # 1405-1565 init_subformations + sort_by_type; subformation_target_
        # pos stacks children behind their parent's back row)
        for layer in sorted(set(int(l) for l in layers)):
            lgroup = slots[layers == layer]
            fid = int(flock_of[lgroup[0]])
            eff_goal = (flock_dest[fid].astype(np.float32)
                        if fid >= 0 else goal)
            occupancy = blockers_all[layer].copy()
            occupancy[own_r, own_c] = 0
            isl_map = self.nav.islands(layer)
            gr = int(np.clip(eff_goal[1] // NAV_TILE_SIZE, 0,
                             self.cfg.field_h - 1))
            gc = int(np.clip(eff_goal[0] // NAV_TILE_SIZE, 0,
                             self.cfg.field_w - 1))
            island = int(isl_map[gr, gc])

            # split the layer block into per-type subformations
            tkey = {int(s): self.unit_type.get(slot_uid.get(int(s)), (0, 0))
                    for s in lgroup}
            fid_cells: list[np.ndarray] = []
            for tk in sorted(set(tkey.values())):
                group = np.asarray([s for s in lgroup if tkey[int(s)] == tk],
                                   np.int32)
                gpos = all_pos[group]
                grad = all_rad[group]
                spacing = max(float(grad.max()) * 3.0,
                              ARRIVAL_THRESHOLD + 1.0)
                cells = layout_cells(
                    len(group), eff_goal - d_unit * depth_off, direction,
                    ftype, spacing=spacing,
                    cost_layer=self.nav.cost_base[layer],
                    occupancy=occupancy,
                    islands=isl_map,
                    island=island if island >= 0 else None)
                if len(cells) == 0:
                    continue   # this block keeps its ring-slot dests
                any_cells = True
                assign = assign_cells(gpos, cells)
                my_cells = cells[np.clip(assign, 0, len(cells) - 1)]
                e = self.state.ents
                sl = jnp.asarray(group)
                cj = jnp.asarray(my_cells)
                fl = self.state.flocks
                self.state = self.state.replace(
                    ents=e.replace(
                        dest=e.dest.at[sl].set(cj),
                        formation_cell=e.formation_cell.at[sl].set(cj),
                        has_formation_cell=e.has_formation_cell.at[sl].set(
                            True),
                    ),
                    # gates the formation keep/drag forces in the tick
                    flocks=fl.replace(
                        formation=fl.formation.at[fid].set(int(ftype))))
                # later blocks must not lay cells on top of this one
                cr = np.clip((my_cells[:, 1] / NAV_TILE_SIZE).astype(int),
                             0, self.cfg.field_h - 1)
                cc = np.clip((my_cells[:, 0] / NAV_TILE_SIZE).astype(int),
                             0, self.cfg.field_w - 1)
                occupancy[cr, cc] = 1
                fid_cells.append(my_cells)
                depth_off += block_depth(cells, direction) + 2.0 * spacing
            # cell-seeded arrival fields: the goal-area chunks flow toward
            # the formation FOOTPRINT (all of the layer's type blocks),
            # not the single goal tile, so units navigate obstacles on the
            # final approach to their own cells (re-design of per-cell
            # fields built in fiber tasks, ref: formation.c:354)
            if fid_cells:
                self.state = self.nav.install_formation_field(
                    self.state, fid, layer, np.concatenate(fid_cells))
        return any_cells

    def _touch_gslot(self, gslot: int) -> None:
        """Mark a global-field slot recently-used (LRU order = dict order)."""
        if gslot in self._gslot_owner:
            fid = self._gslot_owner.pop(gslot)
            self._gslot_owner[gslot] = fid

    def _alloc_gslot(self, fid: int) -> int:
        """Allocate a global-field slab slot for flock `fid`, evicting the
        least-recently-refreshed owner when the slab is full (its flock
        falls back to direct-seek until refreshed). Evictions are counted
        in nav.stats["gslot_evictions"]."""
        free = set(range(self.cfg.global_field_slots)) - set(self._gslot_owner)
        if free:
            gslot = min(free)
        else:
            gslot, old = next(iter(self._gslot_owner.items()))
            del self._gslot_owner[gslot]
            self.nav.stats["gslot_evictions"] = (
                self.nav.stats.get("gslot_evictions", 0) + 1)
            if old < 0:
                # faction chase field (pseudo-fid -(faction*L + layer + 1))
                fac, lay = divmod(-old - 1, self.cfg.num_layers)
                self._chase_gslot.pop((fac, lay), None)
                self._field_sigs.pop(("chase", fac, lay), None)
                ft = self.state.factions
                self.state = self.state.replace(factions=ft.replace(
                    chase_slot=ft.chase_slot.at[fac, lay].set(-1)))
            else:
                self._seek_flocks.pop(old, None)
                self._field_sigs.pop(old, None)
                fl = self.state.flocks
                self.state = self.state.replace(flocks=fl.replace(
                    global_slot=fl.global_slot.at[old].set(-1)))
        self._gslot_owner[gslot] = fid
        return gslot

    def seek_enemies(self, uids: list[int]) -> bool:
        """Order units to hunt the nearest enemies via whole-map
        enemy-seek fields (ref: G_Move_SetSeekEnemies; field TARGET_ENEMIES).
        The selection splits into per-layer flocks, each with a field
        integrated on ITS layer's dilated costs (ref: field.c:1209-1678
        per-layer builders); fields refresh while the flocks live."""
        if not uids:
            return False
        slots = np.array([self.uid_to_slot[u] for u in uids], np.int32)
        layers = np.asarray(self.state.ents.layer)[slots]
        ok = False
        for layer in np.unique(layers):
            ok |= self._seek_enemies_layer(slots[layers == layer],
                                           int(layer))
        return ok

    def _seek_enemies_layer(self, slots: np.ndarray, layer: int) -> bool:
        self._commit_nav()
        if not self._free_flocks:
            self._reclaim_flocks()
        if not self._free_flocks:
            raise RuntimeError("flock table full")
        fid = self._free_flocks.pop()
        faction = int(np.asarray(self.state.ents.faction)[slots[0]])
        gslot = self._alloc_gslot(fid)
        self.state = self.nav.build_enemy_seek_field(
            self.state, faction, layer, gslot, flock_id=fid)
        self._seek_flocks[fid] = (faction, layer, gslot)
        self._seek_created[fid] = self._frame

        e = self.state.ents
        sl = jnp.asarray(_pad_slots(slots, self.cfg.max_ents))
        far = jnp.asarray([self.cfg.world_w * 2, self.cfg.world_h * 2],
                          jnp.float32)
        e = e.replace(
            flock=e.flock.at[sl].set(fid, mode="drop"),
            movestate=e.movestate.at[sl].set(
                MoveState.SEEK_ENEMIES, mode="drop"),
            # never "arrive": combat stops them
            dest=e.dest.at[sl].set(far, mode="drop"),
            has_formation_cell=e.has_formation_cell.at[sl].set(
                False, mode="drop"),
        )
        fl = self.state.flocks
        fl = fl.replace(
            active=fl.active.at[fid].set(True),
            layer=fl.layer.at[fid].set(layer),
            formation=fl.formation.at[fid].set(0),
        )
        self.state = self.state.replace(ents=e, flocks=fl)
        return True

    def surround(self, uids: list[int], target_uid: int) -> bool:
        """Converge on one entity via whole-map surround fields
        (ref: G_Move_SetSurroundEntity, TARGET_ENTITY fields). The
        selection splits into per-layer flocks so big/water units follow
        fields on their own layer's dilated costs."""
        if not uids or target_uid not in self.uid_to_slot:
            return False
        slots = np.array([self.uid_to_slot[u] for u in uids], np.int32)
        layers = np.asarray(self.state.ents.layer)[slots]
        ok = False
        for layer in np.unique(layers):
            ok |= self._surround_layer(slots[layers == layer], target_uid,
                                       int(layer))
        return ok

    def _surround_layer(self, slots: np.ndarray, target_uid: int,
                        layer: int) -> bool:
        self._commit_nav()
        if not self._free_flocks:
            self._reclaim_flocks()
        if not self._free_flocks:
            raise RuntimeError("flock table full")
        fid = self._free_flocks.pop()
        gslot = self._alloc_gslot(fid)
        tslot = self.uid_to_slot[target_uid]
        self.state = self.nav.build_surround_field(
            self.state, fid, tslot, layer, gslot)

        e = self.state.ents
        sl = jnp.asarray(_pad_slots(slots, self.cfg.max_ents))
        tpos = e.pos[tslot]
        e = e.replace(
            flock=e.flock.at[sl].set(fid, mode="drop"),
            movestate=e.movestate.at[sl].set(
                MoveState.SURROUND_ENTITY, mode="drop"),
            dest=e.dest.at[sl].set(tpos, mode="drop"),
            has_formation_cell=e.has_formation_cell.at[sl].set(
                False, mode="drop"),
        )
        fl = self.state.flocks
        fl = fl.replace(
            active=fl.active.at[fid].set(True),
            layer=fl.layer.at[fid].set(layer),
            target_ent=fl.target_ent.at[fid].set(tslot),
            formation=fl.formation.at[fid].set(0),
        )
        self.state = self.state.replace(ents=e, flocks=fl)
        return True

    def _faction_chunk_sigs(self) -> np.ndarray:
        """Per-(faction, chunk) presence signatures — the per-faction
        blocker-count analogue (ref: nav_data.h:118-158 per-faction
        blocker refcounts drive enemy-seek field invalidation,
        fieldcache.h neighbour-enemy-seek rules). The signature folds the
        unit count and quantized tile positions, so it changes whenever
        any unit of that faction moves a tile, dies, or spawns in a chunk."""
        e = self.state.ents
        return np.asarray(_chunk_sig_kernel(
            e.pos, e.alive, e.faction.astype(jnp.int32),
            f_n=self.cfg.max_factions, cr=self.cfg.chunks_r,
            cc=self.cfg.chunks_c))

    def _enemies_changed(self, key, faction: int, sigs: np.ndarray) -> bool:
        """Did any faction at war with `faction` change its chunk
        signature since `key`'s field was last built?"""
        enemies = [g for g in self._host_factions
                   if self._host_diplomacy[faction, g] == 2]
        if not enemies:
            return False
        prev = self._field_sigs.get(key)
        ver = (self._nav_version, self._diplo_version)
        if (prev is None or prev[0] != ver or any(
                not np.array_equal(prev[1][g], sigs[g]) for g in enemies)):
            self._field_sigs[key] = (ver, sigs.copy())
            return True
        return False

    def refresh_seek_fields(self, sigs: np.ndarray | None = None,
                            active: np.ndarray | None = None,
                            snap_frame: int | None = None,
                            specs_out: list | None = None) -> None:
        """Rebuild live enemy-seek fields whose enemy factions actually
        changed (moved a tile / died / spawned) since the last build —
        change-driven invalidation instead of a blind timer (ref:
        nav.c per-faction blocker counts + N_FC enemy-seek invalidation).

        `active`/`snap_frame` may come from a pipelined (stale) snapshot;
        a flock registered after the snapshot must not be treated as dead."""
        if active is None:
            active = np.asarray(self.state.flocks.active)
        if snap_frame is None:
            snap_frame = self._frame
        if sigs is None:
            sigs = self._faction_chunk_sigs()
        specs = [] if specs_out is None else specs_out
        for fid, (faction, layer, gslot) in list(self._seek_flocks.items()):
            if (not active[fid]
                    and self._seek_created.get(fid, -1) < snap_frame):
                del self._seek_flocks[fid]
                self._field_sigs.pop(fid, None)
                continue
            if not self._enemies_changed(fid, faction, sigs):
                continue
            self._touch_gslot(gslot)
            specs.append((faction, layer, gslot, fid))
        if specs_out is None and specs:
            self.state = self.nav.build_enemy_seek_fields_batch(
                self.state, specs)

    def _reclaim_flocks(self) -> None:
        """Free flocks no living entity references (the reference deletes
        empty flocks each movement tick, movement.c make_flocks)."""
        e = self.state.ents
        fl = jnp.where(e.alive, e.flock, -1)
        counts = jnp.zeros((self.cfg.max_flocks,), jnp.int32).at[
            jnp.where(fl >= 0, fl, self.cfg.max_flocks)].add(1, mode="drop")
        active = np.asarray(self.state.flocks.active)
        counts = np.asarray(counts)
        freed = [f for f in range(self.cfg.max_flocks)
                 if active[f] and counts[f] == 0]
        if not freed:
            return
        fr = jnp.asarray(freed)
        fa = self.state.flocks.active.at[fr].set(False)
        gs = self.state.flocks.global_slot.at[fr].set(-1)
        self.state = self.state.replace(
            flocks=self.state.flocks.replace(active=fa, global_slot=gs))
        for f in freed:
            self.nav.slot_mirror[f, :] = -1
            self.nav.los_mirror[f, :] = -1
            self.nav.flock_chunks.pop(f, None)
            self.nav.flock_goal.pop(f, None)
            self._seek_flocks.pop(f, None)
            self._seek_created.pop(f, None)
            self._field_sigs.pop(f, None)
            self._free_flocks.append(f)
        for gs, owner in list(self._gslot_owner.items()):
            if owner in freed:
                del self._gslot_owner[gs]
        fs = jnp.asarray(self.nav.slot_mirror, jnp.int32)
        ls = jnp.asarray(self.nav.los_mirror, jnp.int32)
        self.state = self.state.replace(
            flocks=self.state.flocks.replace(field_slot=fs, los_slot=ls))

    def stop(self, uids: list[int]) -> None:
        slots = jnp.asarray(_pad_slots(
            np.asarray([self.uid_to_slot[u] for u in uids], np.int32),
            self.cfg.max_ents))
        e = self.state.ents
        self.state = self.state.replace(ents=e.replace(
            movestate=e.movestate.at[slots].set(MoveState.ARRIVED,
                                                mode="drop"),
            vel=e.vel.at[slots].set(0.0, mode="drop"),
            flock=e.flock.at[slots].set(-1, mode="drop"),
        ))

    # -- factions / diplomacy ------------------------------------------------------

    def add_faction(self, fac_id: int, controllable: bool = True) -> None:
        self._host_factions.add(fac_id)
        ft = self.state.factions
        self.state = self.state.replace(factions=ft.replace(
            active=ft.active.at[fac_id].set(True),
            controllable=ft.controllable.at[fac_id].set(controllable),
        ))

    def set_diplomacy(self, f1: int, f2: int, dstate: int) -> None:
        if self._host_diplomacy[f1, f2] != dstate:
            self._diplo_version += 1
        self._host_diplomacy[f1, f2] = self._host_diplomacy[f2, f1] = dstate
        ft = self.state.factions
        d = ft.diplomacy.at[f1, f2].set(dstate).at[f2, f1].set(dstate)
        self.state = self.state.replace(factions=ft.replace(diplomacy=d))

    def _refresh_chase_fields(self, sigs: np.ndarray | None = None,
                              fl_counts: np.ndarray | None = None,
                              specs_out: list | None = None) -> None:
        """Rebuild each warring faction's enemy-seek chase fields — combat
        chasers (MOVING_TO_TARGET) follow them around walls instead of
        straight-lining at their target. One field per (faction, OCCUPIED
        nav layer): big/water chasers get fields integrated on their own
        layer's dilated costs (ref: field.c:1209-1678 per-layer enemy-seek
        builders). Rebuilds are change-driven by the per-faction chunk
        signatures; layers that empty out free their slot."""
        from permafrost_engine_tpu.core.config import DiplomacyState

        if sigs is None:
            sigs = self._faction_chunk_sigs()
        if fl_counts is None:
            e = self.state.ents
            fl_counts = np.asarray(_faction_layer_counts(
                e.alive, e.hp, e.faction.astype(jnp.int32),
                e.layer.astype(jnp.int32),
                f_n=self.cfg.max_factions, l_n=self.cfg.num_layers))
        # free chase slots of (faction, layer) pairs that emptied out
        for (f, lay), slot in list(self._chase_gslot.items()):
            if fl_counts[f, lay] == 0:
                del self._chase_gslot[(f, lay)]
                self._field_sigs.pop(("chase", f, lay), None)
                self._gslot_owner.pop(slot, None)
                cs = self.state.factions.chase_slot.at[f, lay].set(-1)
                self.state = self.state.replace(
                    factions=self.state.factions.replace(chase_slot=cs))
        specs = [] if specs_out is None else specs_out
        for f in sorted(self._host_factions):
            at_war = any(
                self._host_diplomacy[f, g] == DiplomacyState.WAR
                for g in self._host_factions if g != f)
            if not at_war:
                continue
            for lay in np.nonzero(fl_counts[f])[0]:
                lay = int(lay)
                slot = self._chase_gslot.get((f, lay))
                fresh = slot is None
                if fresh:
                    slot = self._alloc_gslot(
                        -(f * self.cfg.num_layers + lay + 1))
                    self._chase_gslot[(f, lay)] = slot
                    cs = self.state.factions.chase_slot.at[f, lay].set(slot)
                    self.state = self.state.replace(
                        factions=self.state.factions.replace(chase_slot=cs))
                if (not self._enemies_changed(("chase", f, lay), f, sigs)
                        and not fresh):
                    continue
                self._touch_gslot(slot)
                specs.append((f, lay, slot, None))
        if specs_out is None and specs:
            self.state = self.nav.build_enemy_seek_fields_batch(
                self.state, specs)

    def set_stance(self, uids: list[int], stance: int) -> None:
        slots = jnp.asarray(_pad_slots(
            np.asarray([self.uid_to_slot[u] for u in uids], np.int32),
            self.cfg.max_ents))
        e = self.state.ents
        self.state = self.state.replace(
            ents=e.replace(stance=e.stance.at[slots].set(int(stance),
                                                         mode="drop")))

    # -- stepping ----------------------------------------------------------------

    def _debug_flag(self, name: str) -> bool:
        """A pf.debug.* bool, False when unregistered (engine built
        without pf.init — most tests)."""
        try:
            return bool(self.settings.get(f"pf.debug.{name}"))
        except Exception:
            return False

    def _micro_step_fn(self, k: int):
        """Jitted k-frame stepper threading the SAME (state, acc) pair as k
        single ticks: lax.scan of the tick, donated in and out. Because the
        tick is pure and folds its own events into the accumulator, k fused
        frames are bit-identical to k per-frame dispatches."""
        fn = self._micro_fns.get(k)
        if fn is None:
            if self._tick_fn_nodonate is None:
                self._tick_fn_nodonate = make_tick(
                    self.cfg, getattr(self, "_tile_height", None),
                    donate=False, skin_bank=self._skin_bank)
            tick = self._tick_fn_nodonate

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step_k(state, acc):
                def body(carry, _):
                    return tick(*carry), None

                (state, acc), _ = jax.lax.scan(
                    body, (state, acc), None, length=k)
                return state, acc

            fn = self._micro_fns[k] = step_k
        return fn

    def _fusible_frames(self) -> int:
        """Frames until the next host-cadence boundary — the largest device
        dispatch that is provably identical to per-frame stepping. Every
        host effect in step() fires only when `_frame % period == 0` for
        one of these periods (delta drains, economy/anim/audio, seek/chase
        refresh + blocker machinery), so no intermediate frame can observe
        or produce host work. Caller guarantees no live tasks (tasks may
        wake every frame) and an empty event queue (a handler chain must
        service at frame granularity)."""
        f = self._frame
        k = self.drain_period - f % self.drain_period
        for p in (self.economy_period, self.seek_refresh_period):
            k = min(k, p - f % p)
        return max(k, 1)

    def step(self, n_frames: int = 1) -> None:
        """Advance n 60 Hz frames; collect host events from deltas and run
        host systems (economy, regions, tasks) at their decimated rates —
        the analogue of the reference's frame loop (ref: src/main.c:816).

        Frames between host-cadence boundaries fuse into one lax.scan
        dispatch (micro-batching): through a remote transport the
        per-dispatch overhead is the interactive-mode floor (~4.4 ms/frame
        measured), and the fused segment is bit-identical because the tick
        is pure and all host work is cadence-gated. Live tasks or a pause
        force per-frame dispatches (the reference's frame-granular
        semantics, main.c:86-98); a non-empty event queue does NOT — both
        modes service the queue once at call end."""
        import time as _time

        from permafrost_engine_tpu.core.config import SimState

        left = n_frames
        while left > 0:
            # re-read each segment: a task pausing mid-window must take
            # effect at frame granularity like the reference (main.c:86-98)
            paused = self.sim_state == SimState.PAUSED_FULL
            k = 1
            if (self.micro_batching and not paused
                    and not self.sched.tasks):
                # fusing with a non-empty event queue is behaviour-identical:
                # per-frame mode also services the queue only at call end.
                # Only fuse FULL cadence segments — a `left`-limited
                # remainder would compile a fresh lax.scan shape per call
                # pattern (1-5 min per shape through the remote transport);
                # short remainders run through the cached k==1 tick instead.
                fusible = self._fusible_frames()
                if left >= fusible:
                    k = fusible
            self.perf.begin_tick()
            self._frame += k
            self._commit_nav()
            if not paused:
                with self.perf.scope("device_tick"):
                    # the tick folds each frame's events into the running
                    # accumulator on device: ONE dispatch per segment
                    if k == 1:
                        self.state, self._acc = self._tick_fn(self.state,
                                                              self._acc)
                    else:
                        self.state, self._acc = self._micro_step_fn(k)(
                            self.state, self._acc)
                # every `drain_period` frames the accumulated window starts
                # an ASYNC copy to host and the PREVIOUS window (whose copy
                # has completed by now) is consumed. A synchronous
                # device_get here would stall the whole dispatch pipeline
                # through the remote transport (~30 ms measured at 10k
                # entities); events arriving one window late matches the
                # reference's deferred patch discipline (movement.c:245-262).
                if self._debug_flag("trace_gpu"):
                    # the reference's GPU timestamp queries made explicit
                    # (perf.h:155-163): synchronously time this segment's
                    # device completion — a measurement cost, like theirs
                    _t0 = _time.perf_counter()
                    jax.block_until_ready(self.state.ents.pos)
                    self.perf.counters["trace_gpu_device_ms"] += (
                        _time.perf_counter() - _t0) * 1e3
                with self.perf.scope("drain_deltas"):
                    _drain_t0 = _time.perf_counter()
                    if self._frame % self.drain_period == 0:
                        ready = self._inflight_deltas
                        self._inflight_deltas = self._acc
                        self._acc = self._make_empty()
                        jax.tree_util.tree_map(
                            lambda x: x.copy_to_host_async(),
                            self._inflight_deltas)
                        if ready is not None:
                            self._drain(jax.device_get(ready))
                if self._debug_flag("trace_gpu_stalls"):
                    # a drain wait longer than the segment's frame budget
                    # means the host out-ran the device (ref: GPU stall
                    # tracing, R_GL_PerfStallFrameReport render.c:640)
                    _dms = (_time.perf_counter() - _drain_t0) * 1e3
                    if _dms > k * (1000.0 / 60.0):
                        self.perf.counters["gpu_stall_events"] += 1
                        self.perf.counters["gpu_stall_ms"] += _dms
            with self.perf.scope("host_systems"):
                self._host_systems_tick()
            if self._debug_flag("log_call_graphs"):
                frame = (self.perf._frames[-1] if self.perf._frames
                         else self.perf._current)
                self.call_graph_log.append(
                    [(e.name, round(e.ms, 3), e.parent) for e in frame])
            left -= k
        # one sync at the end of the call: callers observe all their frames
        self.flush_deltas()
        self.bus.service_queue(self.sim_state)

    def flush_deltas(self) -> None:
        """Synchronously drain all in-flight and pending tick deltas
        (tests, shutdown, end of a step() call)."""
        if self._inflight_deltas is not None:
            self._drain(jax.device_get(self._inflight_deltas))
            self._inflight_deltas = None
        self._drain(jax.device_get(self._acc))
        self._acc = self._make_empty()

    def step_scan(self, n_frames: int) -> None:
        """Advance n frames in batched device dispatches (lax.scan); events
        are merged per window (uid granularity preserved).

        With no live host systems the whole window is ONE dispatch. With
        live host systems (economy, regions, seek/chase refresh, tasks) the
        window splits into gcd-of-cadences segments so every host system
        still runs at its exact frame cadence — behaviour matches step()
        instead of collapsing a window's worth of economy ticks into one."""
        import math

        from permafrost_engine_tpu.core.config import SimState

        if self.sim_state == SimState.PAUSED_FULL:
            return
        self._commit_nav()
        if self._scan_fn is None:
            self._scan_fn = make_tick_scan(
                self.cfg, getattr(self, "_tile_height", None),
                skin_bank=self._skin_bank)
        self.flush_deltas()   # per-frame deltas must not arrive out of order

        eco = self.economy
        periods = []
        if (eco.harvesters or eco.builders or eco.resources
                or self.regions.regions or self.anim.states):
            periods.append(self.economy_period)
        if self._seek_flocks or np.any(self._host_diplomacy == 2):
            periods.append(self.seek_refresh_period)
        if self.sched.tasks:
            periods.append(1)   # tasks may wake every frame

        if not periods:
            self.state, deltas = self._scan_fn(self.state, n_frames)
            self._drain(jax.device_get(deltas))
            self._frame += n_frames
            self.bus.service_queue(self.sim_state)
            return

        seg = math.gcd(*periods)
        if seg == 1:
            self.step(n_frames)
            return
        # align to a segment boundary with per-frame steps, then scan in
        # fixed-size segments (one compile shape), draining asynchronously
        align = (-self._frame) % seg
        if align and align <= n_frames:
            self.step(align)
            n_frames -= align
            self.flush_deltas()   # align-frame events precede scan events
        ready = None
        while n_frames >= seg:
            self._commit_nav()
            self.state, d = self._scan_fn(self.state, seg)
            jax.tree_util.tree_map(lambda x: x.copy_to_host_async(), d)
            if ready is not None:
                self._drain(jax.device_get(ready))
            ready = d
            self._frame += seg
            n_frames -= seg
            self._host_systems_tick()
        if ready is not None:
            self._drain(jax.device_get(ready))
        if n_frames:
            self.step(n_frames)
        self.bus.service_queue(self.sim_state)

    def _host_systems_tick(self, force: bool = False) -> None:
        if self.sched.tasks:
            self.sched.tick()
        eco = self.economy
        eco_live = (eco.harvesters or eco.builders or eco.resources
                    or self.regions.regions)
        if force or self._frame % self.economy_period == 0:
            if self.anim.states:
                self.anim.tick(self.economy_period / 60.0)
            self.audio.tick(self.economy_period)
            if self._debug_flag("log_mem_stats"):
                from permafrost_engine_tpu.state.schema import (
                    state_mem_accounting)
                self.mem_stats_log.append(
                    (self._frame, state_mem_accounting(self.state)))
        if self._frame % self.seek_refresh_period == 0:
            import time as _time
            _cnt = self.perf.counters
            _t0 = _time.perf_counter()
            any_war = bool(np.any(self._host_diplomacy == 2))
            # the blocker machinery (3MB snapshot, local-island device
            # call, extension checks) runs every OTHER refresh period:
            # its consumers are rate-limited anyway, and the sync island
            # compute otherwise stalls the dispatch pipeline each cadence
            want_blockers = bool(self.nav.flock_chunks) and (
                self._frame % (2 * self.seek_refresh_period) == 0)
            if self._seek_flocks or any_war or want_blockers:
                # pipelined like the delta drains: start an ASYNC copy of
                # this cadence's (sigs, flock_active, blockers) snapshot and
                # consume the copy started LAST cadence — a synchronous
                # fetch here stalls the whole dispatch pipeline (~30 ms
                # through the remote transport). Fields rebuild one refresh
                # period late, which only delays heuristic invalidation.
                e = self.state.ents
                dev = (_chunk_sig_kernel(
                    e.pos, e.alive, e.faction.astype(jnp.int32),
                    f_n=self.cfg.max_factions, cr=self.cfg.chunks_r,
                    cc=self.cfg.chunks_c),
                    # device-side copies: the state leaves themselves are
                    # DONATED into the next tick while the copy is in flight
                    jnp.copy(self.state.flocks.active),
                    jnp.copy(self.state.nav.blockers)
                    if want_blockers else None,
                    _faction_layer_counts(
                        e.alive, e.hp, e.faction.astype(jnp.int32),
                        e.layer.astype(jnp.int32),
                        f_n=self.cfg.max_factions,
                        l_n=self.cfg.num_layers) if any_war else None,
                    _flock_chunk_occupancy(
                        e.pos, e.alive, e.flock,
                        f_n=self.cfg.max_flocks, cr=self.cfg.chunks_r,
                        cc=self.cfg.chunks_c) if want_blockers else None)
                for x in dev:
                    if x is not None:
                        x.copy_to_host_async()
                prev, self._sigs_inflight = (
                    self._sigs_inflight, (self._frame, dev))
                _cnt["blk_snapshot_ms"] += (_time.perf_counter() - _t0) * 1e3
                if prev is not None:
                    snap_frame, (dsig, dact, dblk, dflc, docc) = prev
                    _t0 = _time.perf_counter()
                    sigs = np.asarray(dsig)
                    _cnt["blk_sig_fetch_ms"] += (
                        _time.perf_counter() - _t0) * 1e3
                    # seek + chase rebuilds share ONE batched dispatch
                    # (sequential per-pair integrates measured ~80 ms of
                    # host dispatch time per cadence at battle contact)
                    field_specs: list = []
                    if self._seek_flocks:
                        _t0 = _time.perf_counter()
                        self.refresh_seek_fields(sigs, np.asarray(dact),
                                                 snap_frame,
                                                 specs_out=field_specs)
                        _cnt["seek_refresh_ms"] += (
                            _time.perf_counter() - _t0) * 1e3
                    if any_war:
                        _t0 = _time.perf_counter()
                        self._refresh_chase_fields(
                            sigs, np.asarray(dflc)
                            if dflc is not None else None,
                            specs_out=field_specs)
                        _cnt["chase_refresh_ms"] += (
                            _time.perf_counter() - _t0) * 1e3
                    if field_specs:
                        _t0 = _time.perf_counter()
                        self.state = self.nav.build_enemy_seek_fields_batch(
                            self.state, field_specs)
                        _cnt["field_batch_ms"] += (
                            _time.perf_counter() - _t0) * 1e3
                    if docc is not None:
                        # units that drifted into chunks off their flock's
                        # planned path get on-demand fields (ref:
                        # fieldcache.c:59-102) instead of direct-seeking
                        # into walls
                        _t0 = _time.perf_counter()
                        occ = np.asarray(docc)
                        _cnt["blk_occ_fetch_ms"] += (
                            _time.perf_counter() - _t0) * 1e3
                        wants = {}
                        for fid in list(self.nav.flock_chunks):
                            missing = np.nonzero(
                                occ[fid]
                                & (self.nav.slot_mirror[fid] < 0))[0]
                            if missing.size:
                                wants[fid] = missing
                        if wants:
                            self.state = self.nav.extend_fields_batch(
                                self.state, wants)
                        _cnt["blk_extend_ms"] += (
                            _time.perf_counter() - _t0) * 1e3
                    if dblk is not None:
                        _t0 = _time.perf_counter()
                        # corridors plugged/unplugged by parked units flip
                        # portal-edge states: flocks pathing through the
                        # flipped chunks replan around (or back through)
                        # them (ref: nav.c:655-693 blocker-aware islands)
                        changed = self.nav.update_blockers(np.asarray(dblk))
                        _cnt["blk_update_ms"] += (
                            _time.perf_counter() - _t0) * 1e3
                        if changed:
                            # rate-limited per flock, and flips in a
                            # flock's own GOAL chunk are excluded: those
                            # are its settling crowd parking, not a
                            # corridor problem — replanning on them
                            # churned 5000-unit flocks every cadence
                            # (measured 30x contact collapse)
                            lim = 4 * self.seek_refresh_period
                            _t0 = _time.perf_counter()
                            occ_np = (np.asarray(docc)
                                      if docc is not None else None)
                            ok_fids = set()
                            for fid in self.nav.flock_chunks:
                                if (self._frame
                                        - self._blocker_replan_frame
                                        .get(fid, -lim) < lim):
                                    continue
                                eff = (changed
                                       & self.nav.flock_chunks[fid])
                                eff -= self._goal_chunk_hood(fid)
                                if not eff:
                                    continue
                                # host-only A* pre-check: replan only when
                                # the DETOUR STATUS changed since the plan
                                # (a plug appeared or cleared) — same-
                                # status edge flicker was the dominant
                                # contact-phase host cost
                                occ_chunks = (
                                    np.nonzero(occ_np[fid])[0]
                                    if occ_np is not None
                                    else list(self.nav.flock_chunks[fid]))
                                detour_now = self.nav.blockers_change_route(
                                    fid, occ_chunks)
                                if detour_now != \
                                        self.nav.flock_plan_detoured.get(
                                            fid, False):
                                    ok_fids.add(fid)
                            _cnt["blk_route_ms"] += (
                                _time.perf_counter() - _t0) * 1e3
                            if ok_fids:
                                _t0 = _time.perf_counter()
                                n = self._replan_flocks(changed, ok_fids)
                                for fid in n:
                                    self._blocker_replan_frame[fid] = \
                                        self._frame
                                _cnt["blk_replan_ms"] += (
                                    _time.perf_counter() - _t0) * 1e3
        if eco_live and (force or self._frame % self.economy_period == 0):
            self.economy.tick()
            if self.regions.regions:
                uid = np.asarray(self.state.ents.uid)
                pos = np.asarray(self.state.ents.pos)
                alive = np.asarray(self.state.ents.alive)
                self.regions.update(uid, pos, alive)
        self.bus.service_queue(self.sim_state)

    def _drain(self, d) -> None:
        # `d` is an already-fetched (host) delta pytree; uids come from the
        # host mirror — no device syncs on this path
        uid_arr = self._slot_uid

        def uids_where(mask):
            return uid_arr[mask]

        def emit(kind, etype, u):
            self.events.append((kind, {"uid": int(u)}))
            self.bus.notify(etype, {"uid": int(u)})
            self.bus.notify(etype, {"uid": int(u)}, uid=int(u))
            self.sched.post_event(etype, {"uid": int(u)})

        if d.arrived.any():
            for u in uids_where(d.arrived):
                emit("motion_end", EventType.MOTION_END, u)
        if d.motion_start.any():
            for u in uids_where(d.motion_start):
                emit("motion_start", EventType.MOTION_START, u)
        hits = np.nonzero(d.proj_hit >= 0)[0]
        if hits.size:
            # hit cookies surface to scripts with shooter/target/damage
            # payload (ref: src/phys/public/phys.h:52-57, combat.c:1020)
            for p in hits:
                shooter = int(d.proj_hit_shooter[p])
                payload = {
                    "uid": int(uid_arr[int(d.proj_hit[p])]),
                    "shooter": int(uid_arr[shooter]) if shooter >= 0 else -1,
                    "cookie": float(d.proj_hit_cookie[p]),
                }
                self.events.append(("projectile_hit", payload))
                self.bus.notify(EventType.PROJECTILE_HIT, payload)
                self.bus.notify(EventType.PROJECTILE_HIT, payload,
                                uid=payload["uid"])
                self.sched.post_event(EventType.PROJECTILE_HIT, payload)
        if d.died.any():
            for u in uids_where(d.died):
                emit("entity_death", EventType.ENTITY_DEATH, u)
        if d.attack_started.any():
            for u in uids_where(d.attack_started):
                emit("attack_start", EventType.ATTACK_START, u)
        if d.corpse_expired.any():
            # corpse slots freed on device; reclaim them host-side
            for u in uids_where(d.corpse_expired):
                u = int(u)
                if u in self._structures:   # destroyed building: unblock nav
                    self.set_structure_blocking(u, False)
                slot = self.uid_to_slot.pop(u, None)
                if slot is not None:
                    self._free_slots.append(slot)
                self.events.append(("entity_removed", {"uid": u}))
                self.bus.notify(EventType.ENTITY_REMOVED, {"uid": u})
                self.bus.unsubscribe_entity(u)
            self.selection.prune_dead(set(self.uid_to_slot))

    # -- entity helpers ------------------------------------------------------------

    def set_flags(self, uids: list[int], set_mask: int = 0,
                  clear_mask: int = 0) -> None:
        # padded gather reads a clamped row for padding slots; the
        # matching padded scatter drops those rows again
        slots = jnp.asarray(_pad_slots(
            np.asarray([self.uid_to_slot[u] for u in uids], np.int32),
            self.cfg.max_ents))
        e = self.state.ents
        f = e.flags[jnp.clip(slots, 0, self.cfg.max_ents - 1)]
        f = (f | jnp.uint32(set_mask)) & ~jnp.uint32(clear_mask)
        self.state = self.state.replace(ents=e.replace(
            flags=e.flags.at[slots].set(f, mode="drop")))

    def teleport(self, uid: int, pos_xz: tuple[float, float]) -> None:
        slot = self.uid_to_slot[uid]
        p = jnp.asarray(np.asarray(pos_xz, np.float32))
        e = self.state.ents
        self.state = self.state.replace(ents=e.replace(
            pos=e.pos.at[slot].set(p),
            prev_pos=e.prev_pos.at[slot].set(p),
        ))

    # -- queries -----------------------------------------------------------------

    @property
    def render_alpha(self) -> float:
        """Interpolation fraction within the current movement tick, for
        render-rate position lerp (ref: interpolate_tick, movement.c:4085).
        Pass to render.draw.draw_buffers(engine, camera, alpha)."""
        from permafrost_engine_tpu.core.config import FRAME_HZ
        period = FRAME_HZ // self.cfg.move_hz
        return ((self._frame % period) + 1) / period

    def prewarm_nav(self) -> None:
        """Compile every batched nav kernel at its capped bucket shapes so
        a mid-battle rebuild storm (structure drop -> mass invalidation)
        never pays a remote XLA compile inside the interactive loop.
        Call at load time (bench/demos); tests skip it — CPU compiles are
        cheap and the shapes compile lazily anyway."""
        self.nav.prewarm(self.state)

    def profile_tick(self, n_frames: int = 60) -> dict:
        """Per-cadence-class device-tick timing: run n frames SYNCHRONOUSLY
        (each tick blocked on) and report per-tick ms stats PER CADENCE
        CLASS. Tick cost is strongly multi-modal — movement fires at
        move_hz, combat at combat_hz, fog at fog_hz, and a frame where
        none fire is ~free — so a single p50 over mixed frames lands on
        whichever mode the probe's phase happened to hit (the r3 bench's
        0.36 ms vs 29.7 ms "contradiction" was exactly this). Frames are
        labeled by which gates fire (game/step.py make_tick); each class
        gets its own p50, plus first-half/second-half p50s so run-to-run
        agreement is visible in the output. Deliberately breaks the
        dispatch pipeline — a measurement probe, not a driving mode (the
        analogue of the reference's N-frame-delayed GPU timestamp queries,
        perf.h:155-163)."""
        import time as _time

        from permafrost_engine_tpu.core.config import FRAME_HZ

        mp = FRAME_HZ // self.cfg.move_hz
        cp = FRAME_HZ // self.cfg.combat_hz
        fp = max(FRAME_HZ // self.cfg.fog_hz, 1)

        jax.block_until_ready(self.state.ents.pos)
        # untimed warmup dispatch: the interactive path usually drives
        # fused segments, so the k==1 tick may not be compiled yet — a
        # compile here would otherwise land in one class's first record
        self.state, self._acc = self._tick_fn(self.state, self._acc)
        self._frame += 1
        jax.block_until_ready(self.state.ents.pos)
        t_base = int(self.state.tick)       # sync scalar fetch: probe-only
        recs: list[tuple[str, float]] = []
        for i in range(n_frames):
            t = t_base + 1 + i              # the gate fires on tick+1
            label = [n for n, p in (("move", mp), ("combat", cp),
                                    ("fog", fp)) if t % p == 0]
            key = "+".join(label) or "base"
            t0 = _time.perf_counter()
            # events from probe frames accumulate in _acc as usual (deaths,
            # corpse expiries reclaim slots host-side on the flush below)
            self.state, self._acc = self._tick_fn(self.state, self._acc)
            jax.block_until_ready(self.state.ents.pos)
            recs.append((key, (_time.perf_counter() - t0) * 1e3))
        self._frame += n_frames
        self.flush_deltas()

        arr = np.asarray([ms for _, ms in recs])
        classes: dict[str, dict] = {}
        half = len(recs) // 2
        for key in sorted({k for k, _ in recs}):
            all_ms = np.asarray([ms for k, ms in recs if k == key])
            h1 = np.asarray([ms for k, ms in recs[:half] if k == key])
            h2 = np.asarray([ms for k, ms in recs[half:] if k == key])
            classes[key] = {
                "ms_p50": round(float(np.median(all_ms)), 3),
                "n": int(all_ms.size),
                "ms_p50_h1": round(float(np.median(h1)), 3) if h1.size else None,
                "ms_p50_h2": round(float(np.median(h2)), 3) if h2.size else None,
            }
        # worst half-to-half disagreement among well-sampled classes: the
        # probe's own stability metric (VERDICT r3 asked for ~20%)
        agree = [abs(c["ms_p50_h1"] - c["ms_p50_h2"])
                 / max((c["ms_p50_h1"] + c["ms_p50_h2"]) / 2, 1e-9) * 100
                 for c in classes.values()
                 if c["n"] >= 6 and c["ms_p50_h1"] and c["ms_p50_h2"]]
        stats = {"ms_p50": float(np.median(arr)),
                 "ms_max": float(arr.max()),
                 "ms_mean": float(arr.mean()),    # amortized per-frame cost
                 "frames": n_frames,
                 "classes": classes,
                 "repeat_spread_pct": round(max(agree), 1) if agree else None}
        # MFU from the AMORTIZED per-frame cost: the per-program flops
        # count covers every gated branch, so only the mixed-cadence mean
        # is a meaningful denominator
        stats.update(self.tick_cost_analysis(stats["ms_mean"]))
        self.perf.counters["device_tick_exact_ms_p50"] = stats["ms_p50"]
        return stats

    # TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16 and
    # ~819 GB/s HBM bandwidth — the roofline the tick is judged against
    PEAK_FLOPS = 197e12
    PEAK_HBM_BPS = 819e9

    def tick_cost_analysis(self, tick_ms: float | None = None) -> dict:
        """XLA cost analysis of the compiled tick: achieved FLOPs + HBM
        bytes per tick, and (given a measured tick time) MFU / bandwidth
        utilisation — quantifies compute- vs dispatch-bound (SURVEY §5
        tracing mapping; the reference reads HW counters, perf.h:155-163,
        which have no TPU user-space analogue — compiler cost analysis is
        the honest substitute)."""
        try:
            ca = (self._tick_fn.lower(self.state, self._acc)
                  .compile().cost_analysis())
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            byts = float(ca.get("bytes accessed", 0.0))
        except Exception:
            return {}
        # Both counts are UPPER BOUNDS: flops sums every lax.cond branch
        # (gated subsystems count even on frames where they don't fire)
        # and "bytes accessed" sums every HLO op's operand+output bytes
        # including traffic fusion keeps in VMEM. A derived bandwidth
        # percentage from the bytes bound measured >200-20000% in r3 —
        # slack enough to be disinformation, so it is no longer reported;
        # the raw byte bound stays for roofline hand-analysis.
        out = {"tick_flops_upper": flops, "tick_hbm_bytes_upper": byts}
        if tick_ms:
            sec = tick_ms / 1e3
            out["mfu_upper_pct"] = round(
                100.0 * flops / sec / self.PEAK_FLOPS, 3)
        return out

    def pos_of(self, uid: int) -> np.ndarray:
        return np.asarray(self.state.ents.pos)[self.uid_to_slot[uid]]

    def movestate_of(self, uid: int) -> MoveState:
        return MoveState(int(np.asarray(self.state.ents.movestate)[self.uid_to_slot[uid]]))
