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
        """cost_base: u8[L, H, W] host mirror of static layer costs."""
        self.cfg = cfg
        self.cost_base = cost_base
        self._graphs: dict[int, pt.PortalGraph] = {}
        self._islands: dict[int, np.ndarray] = {}   # layer -> host mirror
        self.flow_cache = LruSlab(cfg.field_slab_slots)
        self.los_cache = LruSlab(cfg.los_slab_slots)
        # host mirrors of FlockTable slot tables for eviction scrubbing
        self.slot_mirror = np.full((cfg.max_flocks, cfg.num_chunks), -1, np.int64)
        self.los_mirror = np.full((cfg.max_flocks, cfg.num_chunks), -1, np.int64)
        self.stats = {"hits": 0, "misses": 0, "requests": 0, "failed": 0}

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
        # drop cached fields of that layer
        stale = [k for k in self.flow_cache.order if k[0] == layer]
        for k in stale:
            slot = self.flow_cache.order.pop(k)
            self.flow_cache.free.append(slot)
            self.slot_mirror[self.slot_mirror == slot] = -1

    # -- helpers -------------------------------------------------------------

    def _chunk_of_tile(self, r: int, c: int) -> tuple[int, int]:
        return r // FIELD_RES, c // FIELD_RES

    def _chunk_idx(self, cr: int, cc: int) -> int:
        return cr * self.cfg.chunks_c + cc

    def _chunk_cost(self, state: GameState, layer: int, cr: int, cc: int) -> jnp.ndarray:
        """Effective chunk cost on device: static cost with live blockers
        stamped impassable (ref: nav blockers gate pathability)."""
        sl = (
            layer,
            slice(cr * FIELD_RES, (cr + 1) * FIELD_RES),
            slice(cc * FIELD_RES, (cc + 1) * FIELD_RES),
        )
        base = state.nav.cost_base[sl]
        blk = state.nav.blockers[sl]
        return jnp.where(blk > 0, jnp.uint8(COST_IMPASSABLE), base)

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

    def request_path(
        self,
        state: GameState,
        flock_id: int,
        start_xz: tuple[float, float],
        goal_xz: tuple[float, float],
        layer: int,
    ) -> tuple[GameState, bool]:
        """Plan a path and install per-chunk flow fields for a flock.

        Returns (updated state, reachable). On failure the flock's table is
        cleared and entities fall back to direct seek (the reference's
        blocked-destination fallbacks, nav.c:1860-1935, are richer; TODO).
        """
        self.stats["requests"] += 1
        cfg = self.cfg
        # clamp to the map: out-of-bounds orders target the nearest edge tile
        sr, sc = tile_of(start_xz)
        gr, gc = tile_of(goal_xz)
        sr = min(max(sr, 0), cfg.field_h - 1)
        sc = min(max(sc, 0), cfg.field_w - 1)
        gr = min(max(gr, 0), cfg.field_h - 1)
        gc = min(max(gc, 0), cfg.field_w - 1)
        s_chunk = self._chunk_of_tile(sr, sc)
        g_chunk = self._chunk_of_tile(gr, gc)

        # global-island reject: different components can never connect
        # (ref: nav.c:1806-1811) — saves the integrations + A* entirely
        isl = self.islands(layer)
        if (isl[sr, sc] >= 0 and isl[gr, gc] >= 0
                and isl[sr, sc] != isl[gr, gc]):
            self.stats["failed"] += 1
            return self._clear_flock(state, flock_id), False

        graph = self.graph(layer)

        # ---- phase A: start + goal chunk integrations ----------------------
        costs = jnp.stack(
            [self._chunk_cost(state, layer, *s_chunk),
             self._chunk_cost(state, layer, *g_chunk)]
        )
        seeds = np.zeros((2, FIELD_RES, FIELD_RES), bool)
        seeds[0, sr % FIELD_RES, sc % FIELD_RES] = True
        seeds[1, gr % FIELD_RES, gc % FIELD_RES] = True
        integ = np.asarray(ff.integrate(costs, jnp.asarray(seeds)))

        chunk_seq: list[tuple[tuple[int, int], tuple | None]] = []
        # each entry: (chunk, seed_signature); signature None => goal seed

        if s_chunk == g_chunk and integ[0, gr % FIELD_RES, gc % FIELD_RES] < ff.INF_COST / 2:
            chunk_seq = [(g_chunk, None)]
        else:
            start_costs = self._portal_span_costs(graph, integ[0], s_chunk)
            goal_costs = self._portal_span_costs(graph, integ[1], g_chunk)
            path = pt.astar_portals(graph, start_costs, goal_costs, (gr, gc))
            if path is None:
                self.stats["failed"] += 1
                return self._clear_flock(state, flock_id), False
            # fields: dest chunk seeded at goal; every other chunk on the
            # path seeded at its *exit*-portal span — the portal it leaves
            # through toward the goal (walking backwards, ref: nav.c:1941-2042).
            # In the A* node sequence, an exit portal is one immediately
            # followed by its cross-edge pair.
            chunk_seq = [(g_chunk, None)]
            for i in range(len(path) - 1):
                p = graph.portals[path[i]]
                if p.paired == path[i + 1]:
                    chunk_seq.append((p.chunk, ("portal", path[i])))

        return self._install_fields(state, flock_id, layer, (gr, gc), chunk_seq), True

    # -- field building -------------------------------------------------------

    def _install_fields(
        self,
        state: GameState,
        flock_id: int,
        layer: int,
        goal_rc: tuple[int, int],
        chunk_seq: list[tuple[tuple[int, int], tuple | None]],
    ) -> GameState:
        cfg = self.cfg
        graph = self.graph(layer)
        gr, gc = goal_rc

        # dedupe: keep the entry nearest the front (goal seed wins)
        seen = set()
        ordered = []
        for chunk, sig in chunk_seq:
            if chunk in seen:
                continue
            seen.add(chunk)
            key = (layer, chunk, ("goal", gr, gc) if sig is None else sig)
            ordered.append((chunk, sig, key))

        # cache lookups
        to_build = []
        assignments: list[tuple[tuple[int, int], int]] = []
        evicted_any = False
        for chunk, sig, key in ordered:
            slot = self.flow_cache.get(key)
            if slot is None:
                self.stats["misses"] += 1
                slot, evicted = self.flow_cache.put(key)
                if evicted is not None:
                    # another flock may still reference the recycled slot
                    self.slot_mirror[self.slot_mirror == slot] = -1
                    evicted_any = True
                to_build.append((chunk, sig, slot))
            else:
                self.stats["hits"] += 1
            assignments.append((chunk, slot))

        # batched build of missing fields; the batch is padded to the next
        # power of two so K only ever takes log-many distinct shapes (each
        # distinct shape costs a full XLA compile on remote backends)
        if to_build:
            costs, seed_arr, slots = [], [], []
            for chunk, sig, slot in to_build:
                costs.append(self._chunk_cost(state, layer, *chunk))
                seeds = np.zeros((FIELD_RES, FIELD_RES), bool)
                if sig is None:
                    seeds[gr % FIELD_RES, gc % FIELD_RES] = True
                else:
                    pid = sig[1]
                    t = graph.portals[pid].span_tiles()
                    seeds[t[:, 0], t[:, 1]] = True
                seed_arr.append(seeds)
                slots.append(slot)
            k = len(to_build)
            k_pad = 1 << (k - 1).bit_length()
            for _ in range(k_pad - k):
                costs.append(costs[0])
                seed_arr.append(np.zeros((FIELD_RES, FIELD_RES), bool))
                slots.append(state.fields.flow.shape[0])   # dropped write
            costs = jnp.stack(costs)
            integ = ff.integrate(costs, jnp.asarray(np.stack(seed_arr)))
            dirs = ff.flow_dirs(integ, costs)
            flow = state.fields.flow.at[jnp.asarray(slots)].set(
                dirs, mode="drop")
            state = state.replace(fields=state.fields.replace(flow=flow))

        # point the flock's chunk->slot table at the fields
        self.slot_mirror[flock_id, :] = -1
        for chunk, slot in assignments:
            self.slot_mirror[flock_id, self._chunk_idx(*chunk)] = slot
        if evicted_any:
            # eviction scrubbed other flocks' rows: push the whole mirror
            fs = jnp.asarray(self.slot_mirror, jnp.int32)
        else:
            fs = state.flocks.field_slot.at[flock_id].set(
                jnp.asarray(self.slot_mirror[flock_id], jnp.int32))
        state = state.replace(flocks=state.flocks.replace(field_slot=fs))

        # LOS field for the destination chunk: units that can see the goal
        # direct-seek instead of following the field (ref: LOS latch,
        # field.h:195-202, movement.c compute_los_state)
        g_chunk = ordered[0][0]
        los_key = (layer, g_chunk, ("los", gr, gc))
        slot = self.los_cache.get(los_key)
        los_evicted = False
        if slot is None:
            slot, evicted = self.los_cache.put(los_key)
            if evicted is not None:
                # other flocks' device rows may still point at the recycled
                # slot; scrub the mirror AND push it whole (mirrors the
                # evicted_any handling of field_slot above) or those flocks
                # get false has_los from an unrelated destination's field
                self.los_mirror[self.los_mirror == slot] = -1
                los_evicted = True
            passable = self._chunk_cost(state, layer, *g_chunk) != COST_IMPASSABLE
            los = ff.los_field(passable, gr % FIELD_RES, gc % FIELD_RES)
            state = state.replace(fields=state.fields.replace(
                los=state.fields.los.at[slot].set(los)))
        self.los_mirror[flock_id, :] = -1
        self.los_mirror[flock_id, self._chunk_idx(*g_chunk)] = slot
        if los_evicted:
            ls = jnp.asarray(self.los_mirror, jnp.int32)
        else:
            ls = state.flocks.los_slot.at[flock_id].set(
                jnp.asarray(self.los_mirror[flock_id], jnp.int32))
        return state.replace(flocks=state.flocks.replace(los_slot=ls))

    # -- whole-map fields (enemy-seek / surround) --------------------------------

    def build_enemy_seek_field(
        self, state: GameState, flock_id: int, faction: int, layer: int,
        slot: int,
    ) -> GameState:
        """Whole-map field flowing toward every enemy of `faction`
        (ref: field.c enemy-seek frontier builders, field.c:1209-1678).
        Host-chosen `slot` indexes the global slab; the caller owns slot
        assignment/refresh cadence."""
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
        return self._install_global(state, flock_id, layer, slot, seeds)

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
        return self._install_global(state, flock_id, layer, slot, seeds)

    def _install_global(self, state, flock_id, layer, slot, seeds) -> GameState:
        import jax.numpy as jnp

        # seek fields ignore blockers: enemies stand on blocked tiles
        cost = state.nav.cost_base[layer]
        integ = ff.integrate(cost, seeds,
                             max_iters=4 * max(self.cfg.field_h, self.cfg.field_w))
        dirs = ff.flow_dirs(integ, cost)
        gf = state.fields.global_flow.at[slot].set(dirs)
        gs = state.flocks.global_slot.at[flock_id].set(slot)
        return state.replace(
            fields=state.fields.replace(global_flow=gf),
            flocks=state.flocks.replace(global_slot=gs))

    def _clear_flock(self, state: GameState, flock_id: int) -> GameState:
        self.slot_mirror[flock_id, :] = -1
        self.los_mirror[flock_id, :] = -1
        empty = jnp.full((self.cfg.num_chunks,), -1, jnp.int32)
        fs = state.flocks.field_slot.at[flock_id].set(empty)
        ls = state.flocks.los_slot.at[flock_id].set(empty)
        return state.replace(
            flocks=state.flocks.replace(field_slot=fs, los_slot=ls))
