"""Host navigation service: path requests, field cache, slab management.

The device half of navigation is the flow-field slab + per-flock
chunk->slot tables (state/schema.py); this module is the host half —
the analogue of the reference's N_RequestPath + fieldcache
(ref: src/navigation/nav.c:1774-2047, src/navigation/fieldcache.c):

  1. integrate the start and goal chunks (batched, on device)
  2. A* over the portal graph (host, event-rate)
  3. walk the path backwards, building one flow field per chunk —
     all chunks in ONE batched device integration
  4. write fields into LRU slab slots and point the flock's chunk->slot
     table at them

Field keys are (layer, chunk, seed-signature) so flocks sharing a
destination or portal reuse fields, like the reference's ff_id-keyed LRU
(ref: src/navigation/fieldcache.h:53-167).
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    EngineConfig,
    FIELD_RES,
    NAV_TILE_SIZE,
)
from permafrost_engine_tpu.nav import portals as pt
from permafrost_engine_tpu.ops import flowfield as ff
from permafrost_engine_tpu.state.schema import GameState

# Compile-shape discipline: every batched device call pads its batch to a
# size from a SMALL FIXED bucket set ({1, 2, 4, .., cap}) and splits
# anything larger into cap-sized chunks, so a mid-battle storm (structure
# drop -> mass invalidation -> many rebuilds at once) can never present a
# batch size that was not already compiled. Through a remote-compile
# backend a fresh XLA compile lands INSIDE the interactive loop as a
# multi-second stall (measured: an 8.4 s field-batch + 10.7 s extension
# compile collapsed one bench window to 3.7 fps); capped buckets plus
# NavService.prewarm() move every compile to load time — the analogue of
# the reference baking shaders behind its loading screen.
CHUNK_BATCH_CAP = 16   # per-chunk [K, 64, 64] integrates
LOS_BATCH_CAP = 8      # whole-map [U, H, W] LOS builds (closed-form
                       # los_field is ~0.3 ms/batch; cap 8 halves install
                       # roundtrips in a rebuild storm at negligible cost)
SEEK_BATCH_CAP = 4     # whole-map [K, H, W] enemy-seek builds


def batch_buckets(k: int, cap: int) -> list[tuple[int, int, int]]:
    """Split k jobs into (start, count, padded_size) slices whose padded
    sizes come from the fixed set {1, 2, 4, ..., cap}."""
    out, s = [], 0
    while s < k:
        take = min(k - s, cap)
        out.append((s, take, min(1 << (take - 1).bit_length(), cap)))
        s += take
    return out


@jax.jit
def _batched_seek_fields(pos, alive, hp, faction, diplomacy, cost_base,
                         global_flow, global_slot, facs, lays, slots, fids):
    """K whole-map enemy-seek field builds fused into one dispatch:
    seeds scattered per spec ([K, H*W] one scatter), cost planes gathered
    per layer, one batched integrate + flow_dirs, one slab scatter (ref:
    field.c:1209-1678 per-faction enemy-seek builders)."""
    from permafrost_engine_tpu.core.config import DiplomacyState

    f_n = diplomacy.shape[0]
    war = diplomacy == DiplomacyState.WAR
    fac_c = jnp.clip(faction, 0, f_n - 1)
    enemy = (alive & (hp > 0))[None, :] & war[facs][:, fac_c]   # [K, N]
    h, w = cost_base.shape[1], cost_base.shape[2]
    c = jnp.clip((pos[:, 0] / NAV_TILE_SIZE).astype(jnp.int32), 0, w - 1)
    r = jnp.clip((pos[:, 1] / NAV_TILE_SIZE).astype(jnp.int32), 0, h - 1)
    tgt = jnp.where(enemy, (r * w + c)[None, :], h * w)         # [K, N]
    k_idx = jnp.arange(facs.shape[0], dtype=jnp.int32)[:, None]
    seeds = jnp.zeros((facs.shape[0], h * w), jnp.bool_).at[
        k_idx, tgt].set(True, mode="drop").reshape(-1, h, w)
    cost = cost_base[lays]                                      # [K, H, W]
    integ = ff.integrate(cost, seeds, max_iters=4 * max(h, w))
    dirs = ff.flow_dirs(integ, cost)
    # padded specs carry slot == num_global_slots (out of range): dropped,
    # matching the flow/LOS install convention — no live slot is rewritten
    gf = global_flow.at[slots].set(dirs, mode="drop")
    n_fl = global_slot.shape[0]
    gs = global_slot.at[jnp.where(fids >= 0, fids, n_fl)].set(
        slots, mode="drop")
    return gf, gs


class LruSlab:
    """LRU key->slot assignment over a fixed number of slab slots."""

    def __init__(self, num_slots: int):
        self.num_slots = num_slots
        self.order: OrderedDict[tuple, int] = OrderedDict()
        self.free = list(range(num_slots - 1, -1, -1))

    def get(self, key) -> int | None:
        slot = self.order.get(key)
        if slot is not None:
            self.order.move_to_end(key)
        return slot

    def put(self, key) -> tuple[int, tuple | None]:
        """Assign a slot for key; returns (slot, evicted_key_or_None)."""
        if key in self.order:
            self.order.move_to_end(key)
            return self.order[key], None
        evicted = None
        if self.free:
            slot = self.free.pop()
        else:
            evicted, slot = self.order.popitem(last=False)
        self.order[key] = slot
        return slot, evicted

    @property
    def stats(self):
        return {"entries": len(self.order), "free": len(self.free)}


def tile_of(xz: tuple[float, float]) -> tuple[int, int]:
    """Global nav-tile (r, c) for a world position (x, z)."""
    return int(xz[1] // NAV_TILE_SIZE), int(xz[0] // NAV_TILE_SIZE)


class NavService:
    """Host-side navigation orchestrator bound to one engine instance."""

    def __init__(self, cfg: EngineConfig, cost_base: np.ndarray):
        """cost_base: u8[L, H, W] host mirror of static terrain layer costs."""
        self.cfg = cfg
        # terrain_cost is pristine compiled terrain; cost_base is the
        # *effective* static cost = terrain + structure cutouts (the
        # reference cuts buildings into the cost field as static objects,
        # ref: N_CutoutStaticObject nav.c:3326)
        self.terrain_cost = cost_base.copy()
        self.cost_base = cost_base.copy()
        # structure blocker refcounts at ground (1x1) resolution; footprint
        # layers see them dilated (ref: per-footprint stamps of
        # N_BlockersIncrefOBB / radius-dependent cutouts)
        self.structure_ref = np.zeros(
            (cfg.field_h, cfg.field_w), np.int32)
        self._graphs: dict[int, pt.PortalGraph] = {}
        self._islands: dict[int, np.ndarray] = {}   # layer -> host mirror
        # per-chunk integration backend: XLA min-plus relaxation, or the
        # VMEM Pallas kernel when PFTPU_USE_PALLAS=1 (flowfield_pallas)
        from permafrost_engine_tpu.ops.flowfield_pallas import select_backend
        self._integrate = select_backend()
        # row-sharded whole-map integrator (parallel/fields.py); installed
        # by parallel.step.sharded_engine when the engine is mesh-sharded
        # so enemy-seek/surround builds scale with the mesh instead of
        # running replicated (SURVEY §2.9 halo mapping)
        self.sharded_integrate = None
        self.flow_cache = LruSlab(cfg.field_slab_slots)
        self.los_cache = LruSlab(cfg.los_slab_slots)
        # host mirrors of FlockTable slot tables for eviction scrubbing
        self.slot_mirror = np.full((cfg.max_flocks, cfg.num_chunks), -1, np.int64)
        self.los_mirror = np.full((cfg.max_flocks, cfg.num_chunks), -1, np.int64)
        # chunks each flock's installed path runs through, for through-chunk
        # invalidation (ref: fieldcache.h:53-167 at-chunk/through-chunk)
        self.flock_chunks: dict[int, set[int]] = {}
        # per-flock (layer, goal tile) for on-demand field extension when
        # units occupy chunks the planned path never covered
        self.flock_goal: dict[int, tuple[int, tuple[int, int]]] = {}
        # (fid, chunk) extensions that found no path (stray units on a
        # different island): memoized so the cadence doesn't re-pay a
        # device integrate every period; cleared when the world changes
        self._extend_failed: set[tuple[int, int]] = set()
        # (layer, gr, gc) -> {pid: span cost} goal-chunk portal costs,
        # primed at request time and reused by on-demand field extension —
        # without it every extension cadence paid a SYNCHRONOUS goal-chunk
        # integrate per flock (~30 ms pipeline stall each through the
        # remote relay). Cleared whenever portal graphs rebuild (pids
        # renumber) or costs change.
        self._goal_span_cache: dict[tuple[int, int, int],
                                    dict[int, float]] = {}
        # was the flock's installed plan detoured by blocked edges? a
        # CHANGE in this status (plug appears / clears) triggers exactly
        # one replan instead of replanning on every edge flicker
        self.flock_plan_detoured: dict[int, bool] = {}
        # chunks dirtied by structure stamps awaiting commit_structures
        self._pending_dirty: set[int] = set()
        # live-unit blocker integration (ref: nav_data.h:142-158 blocker-
        # aware local islands + blocked portal-edge states, nav.c:655-693):
        # host snapshot of state.nav.blockers, refreshed at the engine's
        # field-refresh cadence, from which per-layer blocked portal-edge
        # sets are derived lazily and compared for replan triggering
        self._blocker_snap: np.ndarray | None = None
        self._blocker_epoch = 0
        # layer -> (epoch, blocked edges frozenset[(pid, qid)],
        #           buried portal pids frozenset)
        self._edge_cache: dict[int, tuple[int, frozenset, frozenset]] = {}
        self.stats = {"hits": 0, "misses": 0, "requests": 0, "failed": 0,
                      "retargeted": 0, "invalidations": 0,
                      "blocked_edges": 0, "blocker_replans": 0,
                      "chunks_rebuilt": 0}

    def prewarm(self, state: GameState) -> None:
        """Compile every batched nav kernel at its capped bucket shapes.

        All batch sites pad to sizes from the fixed sets {1,2,4,8,16}
        (per-chunk integrates), {1,2} (whole-map LOS) and {1,2,4}
        (whole-map enemy-seek), so compiling those shapes here means a
        mid-battle rebuild storm can never trigger a fresh XLA compile
        inside the interactive loop (measured 8-11 s stalls through the
        remote-compile relay). State is functional — every result here is
        simply discarded, nothing is written. The analogue of the
        reference baking its shaders behind the loading screen
        (ref: src/render/gl_shader.c compile-at-init discipline)."""
        cfg = self.cfg
        last = None
        flow_slab, los_slab = state.fields.flow, state.fields.los
        kk = 1
        while kk <= CHUNK_BATCH_CAP:
            costs = jnp.ones((kk, FIELD_RES, FIELD_RES), jnp.uint8)
            seeds = jnp.zeros((kk, FIELD_RES, FIELD_RES), bool
                              ).at[:, 0, 0].set(True)
            svals = jnp.zeros((kk, FIELD_RES, FIELD_RES), jnp.float32)
            i2 = self._integrate(costs, seeds)
            last = ff.flow_dirs(i2, costs)
            i3 = self._integrate(costs, seeds, svals)
            dirs = ff.flow_dirs(i3, costs)
            # the EAGER slab scatters compile per batch shape too (each
            # tiny glue op is ~0.45 s through a remote-compile relay), so
            # warm them exactly as the install sites dispatch them
            sl = jnp.asarray(np.full((kk,), flow_slab.shape[0], np.int64))
            last = flow_slab.at[sl].set(dirs, mode="drop")
            kk *= 2
        # whole-map LOS installs always dispatch at exactly LOS_BATCH_CAP
        # (stages pad to the cap) and extract chunk tiles on device
        lay = jnp.zeros((LOS_BATCH_CAP,), jnp.int32)
        passable = state.nav.cost_base[lay] != COST_IMPASSABLE
        zi = jnp.asarray([0] * LOS_BATCH_CAP)
        maps = ff.los_field(passable, zi, zi,
                            max_iters=2 * max(cfg.field_h, cfg.field_w))
        tiles_dev = (
            maps.reshape(LOS_BATCH_CAP, cfg.chunks_r, FIELD_RES,
                         cfg.chunks_c, FIELD_RES)
            .transpose(0, 1, 3, 2, 4)
            .reshape(LOS_BATCH_CAP * cfg.chunks_r * cfg.chunks_c,
                     FIELD_RES, FIELD_RES).astype(los_slab.dtype))
        kk = 1
        while kk <= CHUNK_BATCH_CAP:
            fi = jnp.zeros((kk,), jnp.int64)
            sll = jnp.asarray(np.full((kk,), los_slab.shape[0], np.int64))
            last = los_slab.at[sll].set(tiles_dev[fi], mode="drop")
            kk *= 2
        if self.sharded_integrate is None:
            e = state.ents
            kk = 1
            while kk <= SEEK_BATCH_CAP:
                zk = jnp.zeros((kk,), jnp.int32)
                last, _ = _batched_seek_fields(
                    e.pos, e.alive, e.hp, e.faction.astype(jnp.int32),
                    state.factions.diplomacy, state.nav.cost_base,
                    state.fields.global_flow, state.flocks.global_slot,
                    zk, zk, zk, jnp.full((kk,), -1, jnp.int32))
                kk *= 2
        if last is not None:
            jax.block_until_ready(last)

    # -- portal graphs -------------------------------------------------------

    def graph(self, layer: int) -> pt.PortalGraph:
        if layer not in self._graphs:
            self._graphs[layer] = pt.build_portal_graph(
                self.cost_base[layer], self.cfg.chunks_r, self.cfg.chunks_c
            )
        return self._graphs[layer]

    def islands(self, layer: int) -> np.ndarray:
        """Global island ids for a layer (host mirror, built on demand —
        ref: n_update_components, nav.c:655)."""
        if layer not in self._islands:
            from permafrost_engine_tpu.ops.islands import label_islands
            self._islands[layer] = np.asarray(
                label_islands(jnp.asarray(self.cost_base[layer])))
        return self._islands[layer]

    def invalidate_layer(self, layer: int) -> None:
        """Call after cost_base edits (terrain change, building placed)."""
        self._graphs.pop(layer, None)
        self._islands.pop(layer, None)
        self._edge_cache.pop(layer, None)   # pids renumber with the graph
        self._goal_span_cache = {k: v for k, v in
                                 self._goal_span_cache.items()
                                 if k[0] != layer}
        # drop cached fields of that layer
        for cache, mirror in ((self.flow_cache, self.slot_mirror),
                              (self.los_cache, self.los_mirror)):
            stale = [k for k in cache.order if k[0] == layer]
            for k in stale:
                slot = cache.order.pop(k)
                cache.free.append(slot)
                mirror[mirror == slot] = -1

    # -- live-unit blocker integration (ref: nav_data.h:142-158) ---------------

    def update_blockers(self, blk: np.ndarray) -> set[int]:
        """Install a fresh host snapshot of the live unit-blocker grids
        (i32[L, H, W], the tick's _restamp_blockers output) and recompute
        per-layer blocked portal-edge states. Returns the set of chunk
        indices whose edge state FLIPPED since the last snapshot — the
        caller replans flocks pathing through them (the reference
        recomputes blocked edge states each movement tick and re-routes,
        ref: nav.c:655-693, a_star.c:212-258)."""
        blk = np.asarray(blk)
        if (self._blocker_snap is not None
                and np.array_equal(blk, self._blocker_snap)):
            # unchanged grid: keep the cached edge sets, nothing flipped
            # (skips the per-cadence local-island device call entirely)
            return set()
        self._blocker_snap = blk
        self._blocker_epoch += 1
        changed: set[int] = set()
        for layer in list(self._graphs):
            prev = self._edge_cache.get(layer)
            prev_edges = prev[1] if prev else frozenset()
            edges, _buried = self._blocked_edges(layer)
            if edges != prev_edges:
                graph = self._graphs[layer]
                for pid, qid in edges ^ prev_edges:
                    if pid < len(graph.portals):
                        changed.add(self._chunk_idx(*graph.portals[pid].chunk))
                    if qid < len(graph.portals):
                        changed.add(self._chunk_idx(*graph.portals[qid].chunk))
        if changed:
            self.stats["blocker_replans"] += 1
        return changed

    def blockers_change_route(self, fid: int,
                              occupied_chunk_idxs) -> bool:
        """Host-only pre-check for blocker-driven replans: does the A*
        route from the flock's occupied chunks to its goal differ WITH
        the blocked-edge filtering vs without? If not, the edge flips
        are cosmetic for this flock and the (device-costly) replan is
        skipped — the dominant battle-contact host cost before this check
        was same-route replans (measured 2.75 ms/frame)."""
        info = self.flock_goal.get(fid)
        if info is None:
            return False
        layer, (gr, gc) = info
        graph = self.graph(layer)
        g_chunk = self._chunk_of_tile(gr, gc)
        blocked, buried = self._blocked_edges(layer)
        if not blocked and not buried:
            return False
        goal_costs = {p: 0.0
                      for p in graph.by_chunk.get(g_chunk, [])}
        start_costs: dict[int, float] = {}
        for ci in occupied_chunk_idxs:
            chunk = (int(ci) // self.cfg.chunks_c,
                     int(ci) % self.cfg.chunks_c)
            if chunk == g_chunk:
                continue
            for p in graph.by_chunk.get(chunk, []):
                start_costs[p] = 0.0
        if not start_costs or not goal_costs:
            return False

        def geom(path):
            if path is None:
                return None
            return tuple((graph.portals[p].chunk, graph.portals[p].side,
                          graph.portals[p].lo, graph.portals[p].hi)
                         for p in path)

        # both runs use the pure-Python solver (a dummy blocked edge forces
        # it): native/python tie-breaking differences must not read as a
        # route change
        dummy = frozenset({(-1, -1)})
        filt = pt.astar_portals(
            graph,
            {p: c for p, c in start_costs.items() if p not in buried},
            {p: c for p, c in goal_costs.items() if p not in buried},
            (gr, gc), (blocked | dummy) if blocked else dummy)
        plain = pt.astar_portals(graph, start_costs, goal_costs,
                                 (gr, gc), dummy)
        return geom(filt) != geom(plain)

    def _blocked_edges(self, layer: int) -> tuple[frozenset, frozenset]:
        """(blocked portal-graph edges, buried portal pids) for a layer
        under the current blocker snapshot. An intra-chunk edge is blocked
        when its two portals land in different blocker-aware local islands;
        a portal is buried when its whole span is blocked. Cached per
        (layer, snapshot epoch)."""
        cached = self._edge_cache.get(layer)
        if cached is not None and cached[0] == self._blocker_epoch:
            return cached[1], cached[2]
        blk = self._blocker_snap
        graph = self.graph(layer)
        if blk is None or not blk[layer].any():
            out = (frozenset(), frozenset())
            self._edge_cache[layer] = (self._blocker_epoch, *out)
            return out
        cfg = self.cfg
        b = blk[layer]
        chunk_any = b.reshape(cfg.chunks_r, FIELD_RES,
                              cfg.chunks_c, FIELD_RES).any(axis=(1, 3))
        dirty = [(r, c) for r, c in zip(*np.nonzero(chunk_any))
                 if graph.by_chunk.get((int(r), int(c)))]
        if not dirty:
            out = (frozenset(), frozenset())
            self._edge_cache[layer] = (self._blocker_epoch, *out)
            return out
        # HOST local-island labels (scipy C-speed): this runs at the
        # refresh cadence, where a synchronous device call would stall the
        # dispatch pipeline ~30 ms through the remote relay (measured:
        # the blocker machinery cost 2.75 ms/frame at battle contact).
        # 4-connectivity components are EXACTLY the pathing connectivity:
        # a diagonal step is legal only when both orthogonal intermediates
        # are passable, i.e. when the two cells are already 4-connected
        # through one of them (ops/islands.py device kernel remains for
        # batched request-time use and as the semantics oracle in tests).
        from scipy import ndimage
        labels = np.empty((len(dirty), FIELD_RES, FIELD_RES), np.int32)
        for i, (cr, cc) in enumerate(dirty):
            sl = (slice(cr * FIELD_RES, (cr + 1) * FIELD_RES),
                  slice(cc * FIELD_RES, (cc + 1) * FIELD_RES))
            passable = ((self.cost_base[layer][sl] != COST_IMPASSABLE)
                        & (b[sl] == 0))
            lab, _n = ndimage.label(passable)
            labels[i] = lab - 1          # -1 = blocked, like the kernel
        # per-portal local component at its span (min label over unblocked
        # span tiles; -1 = buried)
        comp: dict[int, int] = {}
        for i, chunk in enumerate(dirty):
            for pid in graph.by_chunk.get((int(chunk[0]), int(chunk[1])), []):
                t = graph.portals[pid].span_tiles()
                lab = labels[i][t[:, 0], t[:, 1]]
                lab = lab[lab >= 0]
                comp[pid] = int(lab.min()) if lab.size else -1
        blocked: set[tuple[int, int]] = set()
        buried: set[int] = set()
        for pid, c in comp.items():
            p = graph.portals[pid]
            if c < 0:
                buried.add(pid)
                for qid, _w in graph.adj[pid]:
                    blocked.add((pid, qid))
                    blocked.add((qid, pid))
                continue
            for qid, _w in graph.adj[pid]:
                if qid == p.paired:
                    continue       # cross edge: blocked only via burial
                qc = comp.get(qid)
                if qc is not None and qc != c:
                    blocked.add((pid, qid))
        out = (frozenset(blocked), frozenset(buried))
        self._edge_cache[layer] = (self._blocker_epoch, *out)
        self.stats["blocked_edges"] = len(blocked)
        return out

    def set_terrain(self, cost_base: np.ndarray) -> None:
        """Install new compiled terrain costs; all nav derivatives rebuild
        lazily and every cached field is dropped."""
        self.terrain_cost = cost_base.copy()
        self._recompute_effective()
        self._graphs.clear()
        self._islands.clear()
        self._edge_cache.clear()
        self._extend_failed.clear()
        for layer in range(self.cfg.num_layers):
            self.invalidate_layer(layer)

    # -- dynamic structures (ref: nav.c:2119-2206 N_Update) --------------------

    @staticmethod
    def _grow3(x: np.ndarray) -> np.ndarray:
        """3x3 max dilation (one footprint step: 1 -> 3 -> 5 -> 7),
        separable row+column passes."""
        h, w = x.shape
        p = np.pad(x, ((1, 1), (0, 0)))
        m = np.maximum(np.maximum(p[:h], p[1:h + 1]), p[2:h + 2])
        p = np.pad(m, ((0, 0), (1, 1)))
        return np.maximum(np.maximum(p[:, :w], p[:, 1:w + 1]), p[:, 2:w + 2])

    def _recompute_effective(self) -> None:
        """cost_base = terrain with structure cutouts stamped impassable,
        dilated per footprint layer. AIR layers ignore structures."""
        from permafrost_engine_tpu.core.config import (
            NUM_FOOTPRINTS, NavDomain)

        eff = self.terrain_cost.copy()
        if self.structure_ref.any():
            dil = self.structure_ref
            for fp in range(NUM_FOOTPRINTS):
                if fp > 0:
                    dil = self._grow3(dil)
                for dom in (NavDomain.GROUND, NavDomain.WATER):
                    layer = int(dom) * NUM_FOOTPRINTS + fp
                    if layer < self.cfg.num_layers:
                        eff[layer][dil > 0] = COST_IMPASSABLE
        self.cost_base = eff

    def stamp_structure(
        self, tile_rect: tuple[int, int, int, int], delta: int,
    ) -> None:
        """Stamp (+1) or unstamp (-1) a structure footprint given as an
        inclusive nav-tile rect (r0, r1, c0, c1). Host-only and cheap:
        the world update happens in :meth:`commit_structures` once per
        frame boundary, like the reference's dirty-chunk batching
        (ref: N_Update nav.c:2119-2206)."""
        from permafrost_engine_tpu.core.config import NUM_FOOTPRINTS

        cfg = self.cfg
        r0, r1, c0, c1 = tile_rect
        r0 = max(0, r0); c0 = max(0, c0)
        r1 = min(cfg.field_h - 1, r1); c1 = min(cfg.field_w - 1, c1)
        if r1 < r0 or c1 < c0:
            return
        self.structure_ref[r0:r1 + 1, c0:c1 + 1] += delta
        np.clip(self.structure_ref, 0, None, out=self.structure_ref)
        # dirty chunks: the rect grown by the largest footprint dilation
        m = NUM_FOOTPRINTS - 1
        for cr in range(max(0, (r0 - m)) // FIELD_RES,
                        min(cfg.field_h - 1, r1 + m) // FIELD_RES + 1):
            for cc in range(max(0, (c0 - m)) // FIELD_RES,
                            min(cfg.field_w - 1, c1 + m) // FIELD_RES + 1):
                self._pending_dirty.add(self._chunk_idx(cr, cc))

    def commit_structures(
        self, state: GameState,
    ) -> tuple[GameState, set[int] | None]:
        """Apply accumulated structure stamps: recompute effective costs,
        push them to the device, drop portal graphs/islands, invalidate
        cached fields at every dirty chunk. Returns (state, dirty set) or
        (state, None) when nothing was pending
        (ref: nav.c:2119-2206, fieldcache.h at-chunk/through-chunk)."""
        if not self._pending_dirty:
            return state, None
        dirty, self._pending_dirty = self._pending_dirty, set()
        self._extend_failed.clear()   # the world changed: strays may route
        self._recompute_effective()
        state = state.replace(nav=state.nav.replace(
            cost_base=jnp.asarray(self.cost_base)))
        # already-built portal graphs update INCREMENTALLY — only dirty
        # chunks' portals + links rebuild (ref: nav.c:2119-2206); unbuilt
        # layers keep building lazily from the new effective cost. AIR
        # layers never see structures (_recompute_effective), so their
        # graphs are untouched.
        from permafrost_engine_tpu.core.config import (
            NUM_FOOTPRINTS, NavDomain)
        dirty_rc = {(d // self.cfg.chunks_c, d % self.cfg.chunks_c)
                    for d in dirty}
        air0 = int(NavDomain.AIR) * NUM_FOOTPRINTS
        for layer in list(self._graphs):
            if air0 <= layer < air0 + NUM_FOOTPRINTS:
                continue
            self._graphs[layer], n_relinked = pt.update_portal_graph(
                self._graphs[layer], self.cost_base[layer], dirty_rc,
                self.cfg.chunks_r, self.cfg.chunks_c)
            self.stats["chunks_rebuilt"] += n_relinked
        # islands relabel lazily per layer (a cutout can split an island
        # globally, so labels can't be patched chunk-locally); AIR layers
        # keep theirs
        for layer in list(self._islands):
            if not (air0 <= layer < air0 + NUM_FOOTPRINTS):
                del self._islands[layer]
        self._edge_cache.clear()   # pids renumbered
        self._goal_span_cache.clear()
        state = self._invalidate_chunk_fields(state, dirty)
        return state, dirty

    def _invalidate_chunk_fields(
        self, state: GameState, dirty: set[int],
    ) -> GameState:
        """Drop stale cached fields and scrub every flock row pointing at
        the recycled slots. Flow fields invalidate at-chunk; LOS slices are
        cuts of a WHOLE-MAP sightline field, so a structure anywhere can
        block rays through any slice — every LOS entry drops (affected
        flocks rebuild on replan; the rest fall back to field-following,
        which stays correct)."""
        changed = False
        stale_flow = [k for k in self.flow_cache.order
                      if self._chunk_idx(*k[1]) in dirty]
        for k in stale_flow:
            slot = self.flow_cache.order.pop(k)
            self.flow_cache.free.append(slot)
            self.slot_mirror[self.slot_mirror == slot] = -1
            changed = True
            self.stats["invalidations"] += 1
        if self.los_cache.order:
            self.stats["invalidations"] += len(self.los_cache.order)
            self.los_cache = LruSlab(self.cfg.los_slab_slots)
            self.los_mirror[:, :] = -1
            changed = True
        if changed:
            state = state.replace(flocks=state.flocks.replace(
                field_slot=jnp.asarray(self.slot_mirror, jnp.int32),
                los_slot=jnp.asarray(self.los_mirror, jnp.int32)))
        return state

    # -- helpers -------------------------------------------------------------

    def _chunk_of_tile(self, r: int, c: int) -> tuple[int, int]:
        return r // FIELD_RES, c // FIELD_RES

    def _chunk_idx(self, cr: int, cc: int) -> int:
        return cr * self.cfg.chunks_c + cc

    def _chunk_cost(self, state: GameState, layer: int, cr: int, cc: int,
                    with_blockers: bool = True) -> np.ndarray:
        """Static chunk cost from the HOST mirror (kept exactly in sync
        with state.nav.cost_base by set_terrain/commit_structures) — host
        slices avoid a per-chunk eager device dispatch through the remote
        relay; the whole batch uploads once at integrate time.
        Start/goal integrations and LOS use the static cost only — the
        requesting units' own blocker stamps must not make their seed tile
        unreachable (the reference excludes the querying flock from its
        unit snapshot, nav.h:118-134)."""
        sl = (
            layer,
            slice(cr * FIELD_RES, (cr + 1) * FIELD_RES),
            slice(cc * FIELD_RES, (cc + 1) * FIELD_RES),
        )
        base = self.cost_base[sl]
        if not with_blockers:
            return base
        blk = self._chunk_blockers(state, layer, *sl[1:])
        return np.where(blk > 0, np.uint8(COST_IMPASSABLE), base)

    def _chunk_blockers(self, state: GameState, layer: int, cr, cc,
                        ) -> np.ndarray:
        """Live unit blockers for a chunk, from the host snapshot the
        engine refreshes at the field cadence (and syncs on fresh orders).
        At most one refresh period stale — acceptable for build-time
        avoidance of parked units, like the reference's per-tick blocker
        counters read at request time (nav.c:4663-4705)."""
        if not isinstance(cr, slice):
            cr = slice(cr * FIELD_RES, (cr + 1) * FIELD_RES)
            cc = slice(cc * FIELD_RES, (cc + 1) * FIELD_RES)
        if self._blocker_snap is None:
            return np.zeros((FIELD_RES, FIELD_RES), np.int32)
        return self._blocker_snap[layer, cr, cc]

    def _portal_span_costs(
        self, graph: pt.PortalGraph, integ: np.ndarray, chunk: tuple[int, int]
    ) -> dict[int, float]:
        """pid -> min integration cost over the portal span, for portals of
        `chunk`, from a chunk-local integration field."""
        out = {}
        for pid in graph.by_chunk.get(chunk, []):
            t = graph.portals[pid].span_tiles()
            d = float(integ[t[:, 0], t[:, 1]].min())
            if d < ff.INF_COST / 2:
                out[pid] = d
        return out

    # -- the main entry point --------------------------------------------------

    def _nearest_on_island(
        self, layer: int, island: int, near_rc: tuple[int, int],
    ) -> tuple[int, int] | None:
        """Closest tile of `island` to `near_rc` (octile-ish metric) — the
        get-as-close-as-possible retarget of the reference's blocked-
        destination ladder (ref: nav.c:1860-1935)."""
        isl = self.islands(layer)
        ok = isl == island
        if island < 0 or not ok.any():
            return None
        rr, cc = np.nonzero(ok)
        dr = np.abs(rr - near_rc[0])
        dc = np.abs(cc - near_rc[1])
        d = np.maximum(dr, dc) + 0.5 * np.minimum(dr, dc)
        i = int(np.argmin(d))
        return int(rr[i]), int(cc[i])

    def _start_island(self, layer: int, sr: int, sc: int):
        """Island of the start tile; if the start itself is impassable (the
        unit stands inside a freshly-stamped structure footprint), the
        island of the nearest passable tile — plus the (possibly moved)
        seed tile."""
        isl = self.islands(layer)
        if isl[sr, sc] >= 0:
            return int(isl[sr, sc]), sr, sc
        ok = isl >= 0
        if not ok.any():
            return -1, sr, sc
        rr, cc = np.nonzero(ok)
        i = int(np.argmin(np.maximum(np.abs(rr - sr), np.abs(cc - sc))))
        return int(isl[rr[i], cc[i]]), int(rr[i]), int(cc[i])

    def request_path(
        self,
        state: GameState,
        flock_id: int,
        start_xz: tuple[float, float],
        goal_xz: tuple[float, float],
        layer: int,
    ) -> tuple[GameState, bool, tuple[float, float]]:
        """Plan a path and install per-chunk flow fields for a flock.

        Returns (updated state, reachable, effective_goal_xz). When the
        requested destination is blocked or on a different island, the goal
        retargets to the closest reachable tile (the reference's blocked-
        destination fallback ladder, nav.c:1860-1935) and
        `effective_goal_xz` reflects it. On failure the flock's table is
        cleared and entities fall back to direct seek.
        """
        state, results = self.request_paths(
            state, [(flock_id, start_xz, goal_xz, layer)])
        ok, eff = results[0]
        return state, ok, eff

    def request_paths(
        self,
        state: GameState,
        reqs: list[tuple[int, tuple[float, float], tuple[float, float], int]],
    ) -> tuple[GameState, list[tuple[bool, tuple[float, float]]]]:
        """Plan MANY path requests with batched device work: one padded
        integrate for every request's start+goal chunks, one padded
        integrate for every missing field, one batched LOS build. Ordering
        20 flocks in a frame costs the same dispatches as ordering one
        (the reference amortizes through its dest-keyed field cache,
        fieldcache.c:59-102; same-frame batching amortizes the dispatches
        themselves). `reqs`: (flock_id, start_xz, goal_xz, layer) each."""
        cfg = self.cfg
        results: list[tuple[bool, tuple[float, float]] | None] = \
            [None] * len(reqs)
        # ---- stage A: ladder + collect start/goal integration jobs ---------
        live = []   # (ri, fid, layer, (sr,sc), (gr,gc), goal_xz)
        for ri, (fid, start_xz, goal_xz, layer) in enumerate(reqs):
            self.stats["requests"] += 1
            sr, sc = tile_of(start_xz)
            gr, gc = tile_of(goal_xz)
            sr = min(max(sr, 0), cfg.field_h - 1)
            sc = min(max(sc, 0), cfg.field_w - 1)
            gr = min(max(gr, 0), cfg.field_h - 1)
            gc = min(max(gc, 0), cfg.field_w - 1)
            # blocked-destination ladder (ref: nav.c:1860-1935)
            isl = self.islands(layer)
            start_isl, sr, sc = self._start_island(layer, sr, sc)
            if start_isl < 0:
                self.stats["failed"] += 1
                state = self._clear_flock(state, fid)
                results[ri] = (False, goal_xz)
                continue
            if isl[gr, gc] != start_isl:
                rt = self._nearest_on_island(layer, start_isl, (gr, gc))
                if rt is None:
                    self.stats["failed"] += 1
                    state = self._clear_flock(state, fid)
                    results[ri] = (False, goal_xz)
                    continue
                gr, gc = rt
                goal_xz = ((gc + 0.5) * NAV_TILE_SIZE,
                           (gr + 0.5) * NAV_TILE_SIZE)
                self.stats["retargeted"] += 1
            live.append((ri, fid, layer, (sr, sc), (gr, gc), goal_xz))

        if not live:
            return state, [r or (False, reqs[i][2])
                           for i, r in enumerate(results)]

        # one padded integrate over every live request's start+goal chunks
        # (static cost: the requesting units' own blocker stamps must not
        # bury the seeds)
        k = 2 * len(live)
        costs, seeds = [], np.zeros((k, FIELD_RES, FIELD_RES), bool)
        for i, (_ri, _fid, layer, (sr, sc), (gr, gc), _g) in enumerate(live):
            s_chunk = self._chunk_of_tile(sr, sc)
            g_chunk = self._chunk_of_tile(gr, gc)
            costs.append(self._chunk_cost(
                state, layer, *s_chunk, with_blockers=False))
            costs.append(self._chunk_cost(
                state, layer, *g_chunk, with_blockers=False))
            seeds[2 * i, sr % FIELD_RES, sc % FIELD_RES] = True
            seeds[2 * i + 1, gr % FIELD_RES, gc % FIELD_RES] = True
        costs_np = np.stack(costs)
        integ = np.empty((k, FIELD_RES, FIELD_RES), np.float32)
        for s0, cnt, padn in batch_buckets(k, CHUNK_BATCH_CAP):
            cs = np.repeat(costs_np[:1], padn, axis=0)
            sd = np.zeros((padn, FIELD_RES, FIELD_RES), bool)
            cs[:cnt] = costs_np[s0:s0 + cnt]
            sd[:cnt] = seeds[s0:s0 + cnt]
            integ[s0:s0 + cnt] = np.asarray(self._integrate(
                jnp.asarray(cs), jnp.asarray(sd)))[:cnt]

        # ---- stage B: A* + chunk sequences per request ---------------------
        plans = []   # dicts for _install_fields_batch
        for i, (ri, fid, layer, (sr, sc), (gr, gc), goal_xz) in \
                enumerate(live):
            graph = self.graph(layer)
            s_chunk = self._chunk_of_tile(sr, sc)
            g_chunk = self._chunk_of_tile(gr, gc)
            s_integ, g_integ = integ[2 * i], integ[2 * i + 1]
            chunk_seq: list = []
            if (s_chunk == g_chunk
                    and s_integ[gr % FIELD_RES, gc % FIELD_RES]
                    < ff.INF_COST / 2):
                chunk_seq = [(g_chunk, None, 0.0)]
            else:
                start_costs = self._portal_span_costs(graph, s_integ, s_chunk)
                goal_costs = self._portal_span_costs(graph, g_integ, g_chunk)
                self._goal_span_cache[(layer, gr, gc)] = goal_costs
                # filter hops through corridors plugged by parked units:
                # buried portals leave the virtual start/goal sets, island-
                # split edges leave the graph (ref: a_star.c:212-258)
                blocked, buried = self._blocked_edges(layer)
                sc_f = {p: c for p, c in start_costs.items()
                        if p not in buried}
                gc_f = {p: c for p, c in goal_costs.items()
                        if p not in buried}
                path = pt.astar_portals(graph, sc_f, gc_f, (gr, gc), blocked)
                if path is None and blocked:
                    # blockers are transient (units move / die): a possibly-
                    # plugged static path beats hard failure
                    path = pt.astar_portals(graph, start_costs, goal_costs,
                                            (gr, gc))
                if path is None:
                    self.stats["failed"] += 1
                    state = self._clear_flock(state, fid)
                    results[ri] = (False, goal_xz)
                    continue
                chunk_seq = self._chunk_seq_from_path(
                    graph, path, goal_costs, g_chunk)

            # through-chunk tracking for invalidation-driven replans
            self.flock_chunks[fid] = (
                {self._chunk_idx(*c) for c, _, _ in chunk_seq}
                | {self._chunk_idx(*s_chunk), self._chunk_idx(*g_chunk)})
            self.flock_goal[fid] = (layer, (gr, gc))
            self._extend_failed = {
                k for k in self._extend_failed if k[0] != fid}
            self.flock_plan_detoured[fid] = self.blockers_change_route(
                fid, [self._chunk_idx(*s_chunk)])
            plans.append(dict(flock_id=fid, layer=layer, goal_rc=(gr, gc),
                              chunk_seq=chunk_seq, extend=False))
            results[ri] = (True, goal_xz)

        if plans:
            state = self._install_fields_batch(state, plans)
        return state, [r for r in results]

    @staticmethod
    def _chunk_seq_from_path(
        graph: pt.PortalGraph, path: list[int],
        goal_costs: dict[int, float], g_chunk: tuple[int, int],
    ) -> list[tuple[tuple[int, int], tuple | None, float]]:
        """Walk an A* portal path backwards into (chunk, seed-signature,
        cost-to-goal) entries: dest chunk seeded at the goal, every other
        path chunk at its exit-portal span (ref: nav.c:1941-2042)."""
        ctg = {path[-1]: float(goal_costs.get(path[-1], 0.0))}
        for i in range(len(path) - 2, -1, -1):
            w = next(w for q, w in graph.adj[path[i]] if q == path[i + 1])
            ctg[path[i]] = ctg[path[i + 1]] + float(w)
        seq = [(g_chunk, None, 0.0)]
        for i in range(len(path) - 1):
            p = graph.portals[path[i]]
            if p.paired == path[i + 1]:
                seq.append((p.chunk, ("portal", path[i]), ctg[path[i]]))
        return seq

    def extend_fields(
        self, state: GameState, flock_id: int, chunk_idxs,
    ) -> GameState:
        return self.extend_fields_batch(state, {flock_id: chunk_idxs})

    def extend_fields_batch(
        self, state: GameState, wants: dict[int, "np.ndarray | list"],
    ) -> GameState:
        """On-demand field extension for MANY flocks with ONE batched
        device install: the refresh cadence collects every flock's stray
        chunks and installs all missing fields in one padded integrate
        (per-flock sequential installs measured seconds of host stall at
        battle contact after a structure drop invalidated many chunks)."""
        import time as _time

        _t0 = _time.perf_counter()
        plans = []
        for fid, chunk_idxs in wants.items():
            p = self._extend_plan(state, fid, chunk_idxs)
            if p is not None:
                plans.append(p)
        self.stats["extend_plan_ms"] = self.stats.get(
            "extend_plan_ms", 0.0) + (_time.perf_counter() - _t0) * 1e3
        if not plans:
            return state
        return self._install_fields_batch(state, plans)

    def _extend_plan(self, state: GameState, flock_id: int,
                     chunk_idxs) -> dict | None:
        """Plan (host A*, no device work) the field extension for chunks
        the flock's units OCCUPY but its planned path never covered —
        spawn spread across a chunk border, or drift under crowd
        pressure. Without this, strays fall back to direct seek and wedge
        on walls. The reference requests fields on demand per chunk as
        units enter chunks (ref: src/navigation/fieldcache.c:59-102
        dest-keyed on-demand requests). A* runs from any portal of the
        stray chunk to the flock's goal; missing chunks' fields install
        WITHOUT scrubbing the flock's existing table."""
        info = self.flock_goal.get(flock_id)
        if info is None:
            return None
        chunk_idxs = [
            int(ci) for ci in chunk_idxs
            if self.slot_mirror[flock_id, int(ci)] < 0
            and (flock_id, int(ci)) not in self._extend_failed]
        if not chunk_idxs:
            return None
        layer, (gr, gc) = info
        graph = self.graph(layer)
        g_chunk = self._chunk_of_tile(gr, gc)
        goal_costs_all = self._goal_span_cache.get((layer, gr, gc))
        if goal_costs_all is None:
            # cache miss (e.g. session restore): one goal-chunk integrate
            gcost = np.asarray(self._chunk_cost(
                state, layer, *g_chunk, with_blockers=False))[None]
            seeds = np.zeros((1, FIELD_RES, FIELD_RES), bool)
            seeds[0, gr % FIELD_RES, gc % FIELD_RES] = True
            ginteg = np.asarray(self._integrate(jnp.asarray(gcost),
                                                jnp.asarray(seeds)))[0]
            goal_costs_all = self._portal_span_costs(graph, ginteg, g_chunk)
            self._goal_span_cache[(layer, gr, gc)] = goal_costs_all
        blocked, buried = self._blocked_edges(layer)
        goal_costs = {p: c for p, c in goal_costs_all.items()
                      if p not in buried}
        new_seq: list[tuple[tuple[int, int], tuple | None, float]] = []
        covered: set[int] = set()
        for ci in chunk_idxs:
            ci = int(ci)
            if (self.slot_mirror[flock_id, ci] >= 0 or ci in covered
                    or (flock_id, ci) in self._extend_failed):
                continue
            chunk = (ci // self.cfg.chunks_c, ci % self.cfg.chunks_c)
            if chunk == g_chunk:
                new_seq.append((chunk, None, 0.0))
                covered.add(ci)
                continue
            pids = graph.by_chunk.get(chunk, [])
            start_costs = {p: 0.0 for p in pids if p not in buried}
            path = pt.astar_portals(graph, start_costs, goal_costs,
                                    (gr, gc), blocked)
            if path is None and blocked:
                path = pt.astar_portals(graph, {p: 0.0 for p in pids},
                                        goal_costs_all, (gr, gc))
            if path is None:
                self._extend_failed.add((flock_id, ci))
                continue
            for entry in self._chunk_seq_from_path(
                    graph, path, goal_costs_all, g_chunk):
                ei = self._chunk_idx(*entry[0])
                if self.slot_mirror[flock_id, ei] < 0 and ei not in covered:
                    new_seq.append(entry)
                    covered.add(ei)
        if not new_seq:
            return None
        self.flock_chunks.setdefault(flock_id, set()).update(covered)
        return dict(flock_id=flock_id, layer=layer, goal_rc=(gr, gc),
                    chunk_seq=new_seq, extend=True)

    # -- field building -------------------------------------------------------

    def _install_fields(
        self,
        state: GameState,
        flock_id: int,
        layer: int,
        goal_rc: tuple[int, int],
        chunk_seq: list[tuple[tuple[int, int], tuple | None, float]],
        extend: bool = False,
    ) -> GameState:
        return self._install_fields_batch(state, [dict(
            flock_id=flock_id, layer=layer, goal_rc=goal_rc,
            chunk_seq=chunk_seq, extend=extend)])

    def _install_fields_batch(self, state: GameState, plans: list[dict],
                              ) -> GameState:
        """Install flow + LOS fields for MANY plans with batched device
        work: every missing flow field across all plans builds in ONE
        padded integrate, every missing LOS map in ONE batched whole-map
        build, and both flock tables push once.

        A plan: flock_id, layer, goal_rc, chunk_seq, extend. A chunk the
        path visits ONCE gets a plain field (uniform seed offsets don't
        change flow dirs, so the cache key ignores the cost and stays
        shareable); a chunk visited TWICE (exit + re-entry around a
        U-wall) gets a union field whose seed classes carry their
        remaining-path cost. EXTEND plans add chunks without dropping the
        flock's installed rows."""
        cfg = self.cfg
        # slot -> index into flow_jobs/los_jobs, so an eviction of a slot
        # queued for building in THIS batch can void the stale job (the
        # batched scatter would otherwise race two writers on one slot)
        flow_jobs: list[dict | None] = []
        flow_pending: dict[int, int] = {}
        los_jobs: list[dict | None] = []
        los_pending: dict[int, int] = {}

        for plan in plans:
            flock_id = plan["flock_id"]
            layer = plan["layer"]
            gr, gc = plan["goal_rc"]
            graph = self.graph(layer)

            groups: dict[tuple[int, int], list] = {}
            order_chunks: list[tuple[int, int]] = []
            for chunk, sig, cost in plan["chunk_seq"]:
                if chunk not in groups:
                    order_chunks.append(chunk)
                groups.setdefault(chunk, []).append((sig, cost))

            # cache keys use the portal's GEOMETRIC identity (side, span),
            # not its pid: pids renumber globally whenever the portal
            # graph rebuilds (structure commits), and a pid-keyed entry
            # surviving in a clean chunk would collide with an unrelated
            # new portal
            def sig_key(sig, c=None, gr=gr, gc=gc, graph=graph):
                if sig is None:
                    return ("goal", gr, gc) if c is None else ("goal", 0.0)
                p = graph.portals[sig[1]]
                ident = ("portal", p.side, p.lo, p.hi)
                return ident if c is None else ident + (round(c, 1),)

            ordered = []
            for chunk in order_chunks:
                specs = groups[chunk]
                if len(specs) == 1:
                    key = (layer, chunk, sig_key(specs[0][0]))
                else:
                    key = (layer, chunk, ("multi", (gr, gc)) + tuple(
                        sorted(sig_key(s, c) for s, c in specs)))
                ordered.append((chunk, specs, key))

            if not plan["extend"]:
                self.slot_mirror[flock_id, :] = -1
                self.los_mirror[flock_id, :] = -1

            for chunk, specs, key in ordered:
                slot = self.flow_cache.get(key)
                if slot is None:
                    self.stats["misses"] += 1
                    slot, evicted = self.flow_cache.put(key)
                    if evicted is not None:
                        # another flock (or an earlier plan in this batch)
                        # may still reference the recycled slot
                        self.slot_mirror[self.slot_mirror == slot] = -1
                        stale = flow_pending.pop(slot, None)
                        if stale is not None:
                            flow_jobs[stale] = None
                    seeds = np.zeros((FIELD_RES, FIELD_RES), bool)
                    svals = np.zeros((FIELD_RES, FIELD_RES), np.float32)
                    multi = len(specs) > 1
                    for sig, c in specs:
                        if sig is None:
                            seeds[gr % FIELD_RES, gc % FIELD_RES] = True
                        else:
                            t = graph.portals[sig[1]].span_tiles()
                            seeds[t[:, 0], t[:, 1]] = True
                            svals[t[:, 0], t[:, 1]] = c if multi else 0.0
                    flow_pending[slot] = len(flow_jobs)
                    flow_jobs.append(dict(layer=layer, chunk=chunk,
                                          seeds=seeds, svals=svals,
                                          slot=slot))
                else:
                    self.stats["hits"] += 1
                self.slot_mirror[flock_id, self._chunk_idx(*chunk)] = slot

            # LOS fields for EVERY chunk along the path: units that can
            # see the goal direct-seek instead of following the field,
            # even mid-path (the reference chains LOS dest->src across
            # path chunks, ref: field.c:435-537, field.h:195-202; here ONE
            # whole-map LOS build is sliced into the per-chunk slab —
            # exact, not chained)
            for chunk, _specs, _key in ordered:
                los_key = (layer, chunk, ("los", gr, gc))
                slot = self.los_cache.get(los_key)
                if slot is None:
                    slot, evicted = self.los_cache.put(los_key)
                    if evicted is not None:
                        # other flocks' device rows may still point at the
                        # recycled slot; scrub or they get false has_los
                        # from an unrelated destination's field
                        self.los_mirror[self.los_mirror == slot] = -1
                        stale = los_pending.pop(slot, None)
                        if stale is not None:
                            los_jobs[stale] = None
                    los_pending[slot] = len(los_jobs)
                    los_jobs.append(dict(layer=layer, gr=gr, gc=gc,
                                         chunk=chunk, slot=slot))
                self.los_mirror[flock_id, self._chunk_idx(*chunk)] = slot

        # ---- one padded integrate for every missing flow field -------------
        import time as _time

        _t0 = _time.perf_counter()
        jobs = [j for j in flow_jobs if j is not None]
        if jobs:
            costs, blks, seed_arr, cost_arr, slots = [], [], [], [], []
            for j in jobs:
                costs.append(self._chunk_cost(
                    state, j["layer"], *j["chunk"], with_blockers=False))
                blks.append(self._chunk_blockers(
                    state, j["layer"], *j["chunk"]))
                seed_arr.append(j["seeds"])
                cost_arr.append(j["svals"])
                slots.append(j["slot"])
            seeds_np = np.stack(seed_arr)
            # installed fields flow around parked units (blockers), but a
            # blocker must never bury a seed tile (goal/portal span)
            costs_np = np.where(
                (np.stack(blks) > 0) & ~seeds_np,
                np.uint8(COST_IMPASSABLE), np.stack(costs))
            svals_np = np.stack(cost_arr)
            slots_np = np.asarray(slots)
            drop = state.fields.flow.shape[0]   # dropped write
            flow = state.fields.flow
            # capped buckets: batch sizes come from the fixed compiled set
            for s0, cnt, padn in batch_buckets(len(jobs), CHUNK_BATCH_CAP):
                cs = np.repeat(costs_np[:1], padn, axis=0)
                sd = np.zeros((padn, FIELD_RES, FIELD_RES), bool)
                sv = np.zeros((padn, FIELD_RES, FIELD_RES), np.float32)
                sl = np.full((padn,), drop, np.int64)
                cs[:cnt] = costs_np[s0:s0 + cnt]
                sd[:cnt] = seeds_np[s0:s0 + cnt]
                sv[:cnt] = svals_np[s0:s0 + cnt]
                sl[:cnt] = slots_np[s0:s0 + cnt]
                cj = jnp.asarray(cs)
                integ = self._integrate(cj, jnp.asarray(sd), jnp.asarray(sv))
                dirs = ff.flow_dirs(integ, cj)
                flow = flow.at[jnp.asarray(sl)].set(dirs, mode="drop")
            state = state.replace(fields=state.fields.replace(flow=flow))

        self.stats["install_flow_ms"] = self.stats.get(
            "install_flow_ms", 0.0) + (_time.perf_counter() - _t0) * 1e3
        self.stats["install_flow_jobs"] = self.stats.get(
            "install_flow_jobs", 0) + len(jobs)

        # ---- one batched build for every missing LOS map -------------------
        _t0 = _time.perf_counter()
        ljobs = [j for j in los_jobs if j is not None]
        if ljobs:
            uniq: list[tuple[int, int, int]] = []
            uidx: dict[tuple[int, int, int], int] = {}
            for j in ljobs:
                key = (j["layer"], j["gr"], j["gc"])
                if key not in uidx:
                    uidx[key] = len(uniq)
                    uniq.append(key)
            # whole-map LOS builds staged at ONE fixed shape (always pad
            # to LOS_BATCH_CAP: the closed-form build is ~0.3 ms/batch,
            # so padded rows are cheaper than extra compiled shapes) and
            # the per-chunk tile extraction + slab scatter stay ON
            # DEVICE: the previous path np.asarray'd each [U, H, W]
            # batch (a ~30 ms SYNC fetch through the relay), sliced
            # tiles on host and re-uploaded them — obstacle-bench
            # install_los_ms 1.6 s; this path never syncs.
            cr, cc = cfg.chunks_r, cfg.chunks_c
            los = state.fields.los
            drop_l = los.shape[0]
            job_u = np.asarray(
                [uidx[(j["layer"], j["gr"], j["gc"])] for j in ljobs])
            slots_np = np.asarray([j["slot"] for j in ljobs])
            jr0 = np.asarray([j["chunk"][0] for j in ljobs])
            jc0 = np.asarray([j["chunk"][1] for j in ljobs])
            for u0 in range(0, len(uniq), LOS_BATCH_CAP):
                stage = uniq[u0:u0 + LOS_BATCH_CAP]
                padded = stage + [stage[0]] * (LOS_BATCH_CAP - len(stage))
                lay = jnp.asarray([l for l, _g, _c in padded])
                passable = state.nav.cost_base[lay] != COST_IMPASSABLE
                grs = jnp.asarray([g for _l, g, _c in padded])
                gcs = jnp.asarray([c for _l, _g, c in padded])
                maps = ff.los_field(
                    passable, grs, gcs,
                    max_iters=2 * max(cfg.field_h, cfg.field_w))
                # [U, H, W] -> [U*CR*CC, 64, 64] contiguous chunk tiles
                tiles_dev = (
                    maps.reshape(LOS_BATCH_CAP, cr, FIELD_RES, cc,
                                 FIELD_RES)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(LOS_BATCH_CAP * cr * cc, FIELD_RES,
                             FIELD_RES).astype(los.dtype))
                sel = np.nonzero(
                    (job_u >= u0) & (job_u < u0 + LOS_BATCH_CAP))[0]
                flat = ((job_u[sel] - u0) * cr * cc
                        + jr0[sel] * cc + jc0[sel]).astype(np.int64)
                ssl = slots_np[sel]
                for s0, cnt, padn in batch_buckets(len(sel),
                                                   CHUNK_BATCH_CAP):
                    fi = np.zeros((padn,), np.int64)
                    sl = np.full((padn,), drop_l, np.int64)
                    fi[:cnt] = flat[s0:s0 + cnt]
                    sl[:cnt] = ssl[s0:s0 + cnt]
                    # row gather of whole tiles + bucketed slab scatter
                    los = los.at[jnp.asarray(sl)].set(
                        tiles_dev[jnp.asarray(fi)], mode="drop")
            state = state.replace(fields=state.fields.replace(los=los))

        self.stats["install_los_ms"] = self.stats.get(
            "install_los_ms", 0.0) + (_time.perf_counter() - _t0) * 1e3
        self.stats["install_los_jobs"] = self.stats.get(
            "install_los_jobs", 0) + len(ljobs)

        # ---- push both flock tables once -----------------------------------
        return state.replace(flocks=state.flocks.replace(
            field_slot=jnp.asarray(self.slot_mirror, jnp.int32),
            los_slot=jnp.asarray(self.los_mirror, jnp.int32)))

    def install_formation_field(
        self, state: GameState, flock_id: int, layer: int,
        cells_xy: np.ndarray,
    ) -> GameState:
        """Replace the flock's fields in the chunks containing its
        formation cells with CELL-SEEDED fields: every cell tile seeds at
        cost 0, so the final approach flows toward the formation footprint
        and around obstacles near it, then arrive-steers onto the exact
        cell (re-design of the reference's per-cell arrival flow fields
        built in fiber tasks, ref: src/game/formation.c:354)."""
        cfg = self.cfg
        tiles = np.unique(np.stack([
            np.clip(cells_xy[:, 1] // NAV_TILE_SIZE, 0,
                    cfg.field_h - 1).astype(np.int64),
            np.clip(cells_xy[:, 0] // NAV_TILE_SIZE, 0,
                    cfg.field_w - 1).astype(np.int64)], 1), axis=0)
        groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for r, c in tiles:
            groups.setdefault(self._chunk_of_tile(int(r), int(c)),
                              []).append((int(r), int(c)))

        to_build: list[tuple[tuple[int, int], list, int]] = []
        assignments: list[tuple[tuple[int, int], int]] = []
        evicted_any = False
        for chunk, ctiles in groups.items():
            local = tuple(sorted((r % FIELD_RES) * FIELD_RES + (c % FIELD_RES)
                                 for r, c in ctiles))
            key = (layer, chunk, ("cells",) + local)
            slot = self.flow_cache.get(key)
            if slot is None:
                self.stats["misses"] += 1
                slot, evicted = self.flow_cache.put(key)
                if evicted is not None:
                    self.slot_mirror[self.slot_mirror == slot] = -1
                    evicted_any = True
                to_build.append((chunk, ctiles, slot))
            else:
                self.stats["hits"] += 1
            assignments.append((chunk, slot))

        if to_build:
            costs, blks, seed_arr, slots = [], [], [], []
            for chunk, ctiles, slot in to_build:
                costs.append(self._chunk_cost(
                    state, layer, *chunk, with_blockers=False))
                blks.append(self._chunk_blockers(state, layer, *chunk))
                seeds = np.zeros((FIELD_RES, FIELD_RES), bool)
                for r, c in ctiles:
                    seeds[r % FIELD_RES, c % FIELD_RES] = True
                seed_arr.append(seeds)
                slots.append(slot)
            seeds_np = np.stack(seed_arr)
            costs_np = np.where(
                (np.stack(blks) > 0) & ~seeds_np,
                np.uint8(COST_IMPASSABLE), np.stack(costs))
            slots_np = np.asarray(slots)
            drop = state.fields.flow.shape[0]
            flow = state.fields.flow
            for s0, cnt, padn in batch_buckets(len(to_build),
                                               CHUNK_BATCH_CAP):
                cs = np.repeat(costs_np[:1], padn, axis=0)
                sd = np.zeros((padn, FIELD_RES, FIELD_RES), bool)
                sl = np.full((padn,), drop, np.int64)
                cs[:cnt] = costs_np[s0:s0 + cnt]
                sd[:cnt] = seeds_np[s0:s0 + cnt]
                sl[:cnt] = slots_np[s0:s0 + cnt]
                cj = jnp.asarray(cs)
                integ = self._integrate(cj, jnp.asarray(sd))
                dirs = ff.flow_dirs(integ, cj)
                flow = flow.at[jnp.asarray(sl)].set(dirs, mode="drop")
            state = state.replace(fields=state.fields.replace(flow=flow))

        for chunk, slot in assignments:
            idx = self._chunk_idx(*chunk)
            self.slot_mirror[flock_id, idx] = slot
            # through-chunk tracking: structure/blocker changes in the
            # formation's chunks replan it
            self.flock_chunks.setdefault(flock_id, set()).add(idx)
        if evicted_any:
            fs = jnp.asarray(self.slot_mirror, jnp.int32)
        else:
            fs = state.flocks.field_slot.at[flock_id].set(
                jnp.asarray(self.slot_mirror[flock_id], jnp.int32))
        return state.replace(flocks=state.flocks.replace(field_slot=fs))

    # -- whole-map fields (enemy-seek / surround) --------------------------------

    def build_enemy_seek_fields_batch(
        self, state: GameState,
        specs: list[tuple[int, int, int, int | None]],
    ) -> GameState:
        """Rebuild MANY whole-map enemy-seek fields in ONE device dispatch.

        `specs` is a list of (faction, layer, slot, flock_id|None). The
        refresh cadence previously dispatched one integrate chain per
        (faction, layer) pair sequentially — measured ~80 ms of host
        dispatch time per cadence at battle contact through the remote
        relay; the batched kernel folds every seed scatter, integration,
        flow quantization and slab write into one jitted call (the
        reference rebuilds each faction's enemy-seek field in its own
        fiber, field.c:1209-1678 — fibers compose here as a batch axis).
        Spec count pads to the next power of two with a SENTINEL spec
        (fid=-1, slot=num_global_slots) whose writes are dropped, so
        compile shapes stay bucketed without rewriting any live slot."""
        if not specs:
            return state
        if self.sharded_integrate is not None:
            # sharded engines keep the row-sharded whole-map integrator
            for f, lay, slot, fid in specs:
                state = self.build_enemy_seek_field(state, f, lay, slot,
                                                    flock_id=fid)
            return state
        n_global = state.fields.global_flow.shape[0]
        sentinel = (0, 0, n_global, None)     # slot out of range -> dropped
        for s0, cnt, padn in batch_buckets(len(specs), SEEK_BATCH_CAP):
            padded = specs[s0:s0 + cnt] + [sentinel] * (padn - cnt)
            facs = jnp.asarray([s[0] for s in padded], jnp.int32)
            lays = jnp.asarray([s[1] for s in padded], jnp.int32)
            slots = jnp.asarray([s[2] for s in padded], jnp.int32)
            fids = jnp.asarray([-1 if s[3] is None else s[3]
                                for s in padded], jnp.int32)
            ents = state.ents
            gf, gs = _batched_seek_fields(
                ents.pos, ents.alive, ents.hp,
                ents.faction.astype(jnp.int32), state.factions.diplomacy,
                state.nav.cost_base, state.fields.global_flow,
                state.flocks.global_slot, facs, lays, slots, fids)
            state = state.replace(
                fields=state.fields.replace(global_flow=gf),
                flocks=state.flocks.replace(global_slot=gs))
        return state

    def build_enemy_seek_field(
        self, state: GameState, faction: int, layer: int, slot: int,
        flock_id: int | None = None,
    ) -> GameState:
        """Whole-map field flowing toward every enemy of `faction`
        (ref: field.c enemy-seek frontier builders, field.c:1209-1678).
        Host-chosen `slot` indexes the global slab; the caller owns slot
        assignment/refresh cadence. With flock_id=None only the slab is
        written (per-faction combat-chase fields)."""
        import jax.numpy as jnp
        from permafrost_engine_tpu.core.config import DiplomacyState

        ents = state.ents
        war = state.factions.diplomacy == DiplomacyState.WAR
        enemy = ents.alive & (ents.hp > 0) & war[faction][
            jnp.clip(ents.faction, 0, war.shape[0] - 1)]
        h, w = self.cfg.field_h, self.cfg.field_w
        c = jnp.clip((ents.pos[:, 0] / NAV_TILE_SIZE).astype(jnp.int32), 0, w - 1)
        r = jnp.clip((ents.pos[:, 1] / NAV_TILE_SIZE).astype(jnp.int32), 0, h - 1)
        flat = jnp.where(enemy, r * w + c, h * w)
        seeds = jnp.zeros((h * w,), jnp.bool_).at[flat].set(
            True, mode="drop").reshape(h, w)
        return self._install_global(state, layer, slot, seeds, flock_id)

    def build_surround_field(
        self, state: GameState, flock_id: int, target_slotidx: int,
        layer: int, slot: int,
    ) -> GameState:
        """Whole-map field toward one entity (TARGET_ENTITY, field.h:79)."""
        import jax.numpy as jnp

        ents = state.ents
        h, w = self.cfg.field_h, self.cfg.field_w
        p = ents.pos[target_slotidx]
        r = jnp.clip((p[1] / NAV_TILE_SIZE).astype(jnp.int32), 0, h - 1)
        c = jnp.clip((p[0] / NAV_TILE_SIZE).astype(jnp.int32), 0, w - 1)
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        seeds = (rows == r) & (cols == c)
        return self._install_global(state, layer, slot, seeds, flock_id)

    def _install_global(self, state, layer, slot, seeds,
                        flock_id: int | None = None) -> GameState:
        import jax.numpy as jnp

        # seek fields ignore blockers: enemies stand on blocked tiles
        cost = state.nav.cost_base[layer]
        if self.sharded_integrate is not None:
            # whole-map build executes row-sharded with ICI halo exchange
            integ = self.sharded_integrate(cost, seeds)
        else:
            integ = ff.integrate(
                cost, seeds,
                max_iters=4 * max(self.cfg.field_h, self.cfg.field_w))
        dirs = ff.flow_dirs(integ, cost)
        gf = state.fields.global_flow.at[slot].set(dirs)
        state = state.replace(fields=state.fields.replace(global_flow=gf))
        if flock_id is not None:
            gs = state.flocks.global_slot.at[flock_id].set(slot)
            state = state.replace(flocks=state.flocks.replace(global_slot=gs))
        return state

    def _clear_flock(self, state: GameState, flock_id: int) -> GameState:
        self.flock_chunks.pop(flock_id, None)
        self.flock_goal.pop(flock_id, None)
        self.flock_plan_detoured.pop(flock_id, None)
        self._extend_failed = {
            k for k in self._extend_failed if k[0] != flock_id}
        self.slot_mirror[flock_id, :] = -1
        self.los_mirror[flock_id, :] = -1
        empty = jnp.full((self.cfg.num_chunks,), -1, jnp.int32)
        fs = state.flocks.field_slot.at[flock_id].set(empty)
        ls = state.flocks.los_slot.at[flock_id].set(empty)
        return state.replace(
            flocks=state.flocks.replace(field_slot=fs, los_slot=ls))
