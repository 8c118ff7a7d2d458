"""Spatial indexing: cell binning + bounded k-nearest-neighbour queries.

The reference's spatial index is a SIMD-accelerated bitmap grid over 16-unit
cells with packed ranges and overflow chains, repacked per frame
(ref: src/lib/public/bitmap_grid.h:36-120). The TPU-native equivalent is a
dense rebuild every query tick: sort entities by cell id, scatter slots into
fixed-capacity cell buckets, then answer "nearest <=K entities of X within
radius" by gathering a static window of cells around each queryer and
running a vectorized top-k. No pointers, no chains — everything is one
sort + one scatter + gathers, all batched over the whole arena.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import SPATIAL_CELL_SIZE


@flax.struct.dataclass
class SpatialGrid:
    """Cell buckets of entity slots; -1 marks empty bucket entries.

    `bucket_xy` carries the indexed entities' positions in bucket layout so
    queries fetch candidate coordinates with *row* gathers (one [cap, 2]
    row per cell) instead of per-element arena gathers — element gathers
    run ~1 element/cycle on TPU and dominated the knn cost at 16k entities.
    `bucket_payload` optionally carries extra per-entity channels the same
    way (velocity/flock/flags for the fused crowd kernel path).
    """

    buckets: jax.Array     # i32[cells_r * cells_c, cap] entity slots or -1
    bucket_xy: jax.Array   # f32[cells_r * cells_c, cap, 2] positions
    cell_of: jax.Array     # i32[N] flat cell id per entity (dead: num_cells)
    bucket_payload: jax.Array | None  # f32[cells, cap, P] or None
    cells_r: int = flax.struct.field(pytree_node=False)
    cells_c: int = flax.struct.field(pytree_node=False)
    cell_size: float = flax.struct.field(
        pytree_node=False, default=SPATIAL_CELL_SIZE)


def cell_coords(pos: jax.Array, cells_r: int, cells_c: int,
                cell_size: float = SPATIAL_CELL_SIZE,
                ) -> tuple[jax.Array, jax.Array]:
    """Clamped (row, col) cell coordinates for world positions [..., 2]=(x,z)."""
    c = jnp.clip((pos[..., 0] / cell_size).astype(jnp.int32), 0, cells_c - 1)
    r = jnp.clip((pos[..., 1] / cell_size).astype(jnp.int32), 0, cells_r - 1)
    return r, c


@functools.partial(jax.jit,
                   static_argnames=("cells_r", "cells_c", "cap", "cell_size"))
def build_grid(
    pos: jax.Array,
    alive: jax.Array,
    *,
    cells_r: int,
    cells_c: int,
    cap: int,
    payload: jax.Array | None = None,   # f32[N, P] extra channels
    cell_size: float = SPATIAL_CELL_SIZE,
) -> SpatialGrid:
    """Bin alive entities into fixed-capacity cell buckets.

    Overflowing entities (more than `cap` in one cell) are dropped from the
    index — the analogue of the reference's bounded query outputs, which
    drop the farthest candidates on overflow (ref: src/game/clearpath.c:390).
    """
    n = pos.shape[0]
    num_cells = cells_r * cells_c
    r, c = cell_coords(pos, cells_r, cells_c, cell_size)
    cell = jnp.where(alive, r * cells_c + c, num_cells)

    order = jnp.argsort(cell, stable=True)
    sorted_cell = cell[order]
    # rank within each cell = position - index of first occurrence
    first_occ = jnp.searchsorted(sorted_cell, sorted_cell, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first_occ.astype(jnp.int32)

    flat = jnp.full((num_cells * cap,), -1, jnp.int32)
    slot_idx = sorted_cell * cap + rank
    valid = (sorted_cell < num_cells) & (rank < cap)
    slot_idx = jnp.where(valid, slot_idx, num_cells * cap)  # dropped
    flat = flat.at[slot_idx].set(order.astype(jnp.int32), mode="drop")
    flat_xy = jnp.full((num_cells * cap, 2), 1e30, jnp.float32)
    flat_xy = flat_xy.at[slot_idx].set(pos[order], mode="drop")
    flat_pay = None
    if payload is not None:
        p = payload.shape[1]
        flat_pay = jnp.zeros((num_cells * cap, p), jnp.float32)
        flat_pay = flat_pay.at[slot_idx].set(
            payload[order].astype(jnp.float32), mode="drop")
        flat_pay = flat_pay.reshape(num_cells, cap, p)

    return SpatialGrid(
        buckets=flat.reshape(num_cells, cap),
        bucket_xy=flat_xy.reshape(num_cells, cap, 2),
        cell_of=cell.astype(jnp.int32),
        bucket_payload=flat_pay,
        cells_r=cells_r,
        cells_c=cells_c,
        cell_size=cell_size,
    )


@flax.struct.dataclass
class ContactGrid:
    """Fine contact grid as ONE packed f32[cells, cap, 2+Q+1] array with
    channels (x, z, payload..., slot) — "pack at the point of a gather":
    the only consumer is the 3x3-cell contact query, and one wide row
    gather per cell beats three narrow ones (buckets/xy/payload
    separately) 3x in gather count and 4x in row width. Slots stay exact
    as f32 below 2^24; -1 marks empty entries."""

    packed: jax.Array
    cell_of: jax.Array     # i32[N] flat fine cell per entity (dead: cells)
    cells_r: int = flax.struct.field(pytree_node=False)
    cells_c: int = flax.struct.field(pytree_node=False)
    cell_size: float = flax.struct.field(pytree_node=False)

    @property
    def buckets(self):
        """i32[cells, cap] slot view (tests/debug; not the hot path)."""
        return self.packed[..., -1].astype(jnp.int32)

    @property
    def bucket_xy(self):
        return self.packed[..., 0:2]

    @property
    def bucket_payload(self):
        return self.packed[..., 2:-1]


@functools.partial(jax.jit, static_argnames=(
    "cells_r", "cells_c", "cap", "cell_size",
    "fine_r", "fine_c", "fine_cap", "fine_cell_size"))
def build_grid_pair(
    pos: jax.Array,
    alive: jax.Array,
    *,
    cells_r: int,
    cells_c: int,
    cap: int,
    payload: jax.Array,                 # f32[N, P] coarse payload
    fine_r: int,
    fine_c: int,
    fine_cap: int,
    fine_payload: jax.Array,            # f32[N, Q] fine payload
    cell_size: float = SPATIAL_CELL_SIZE,
    fine_cell_size: float,
) -> tuple[SpatialGrid, SpatialGrid]:
    """Build the coarse avoidance grid AND the fine contact grid from ONE
    argsort.

    The movement substep needs both grids every tick over the same entity
    set (ref: the reference's single bitmap grid serves both queries,
    src/lib/public/bitmap_grid.h:36; we split coarse/fine because contact
    resolution saturates 16u buckets at choke density). The fine cell size
    divides the coarse one, so sorting by the composite key
    ``coarse_id * subcells + sub_id`` groups entities by coarse cell AND,
    within it, by fine cell — one sort yields both grids' within-cell ranks
    via two searchsorted passes. Within-cell overflow drop ORDER differs
    from two separate builds (sub-cell-major instead of slot-major); both
    honour the bounded-output semantics (clearpath.c:390).
    """
    ratio = int(round(cell_size / fine_cell_size))
    assert abs(ratio * fine_cell_size - cell_size) < 1e-6
    n = pos.shape[0]
    num_coarse = cells_r * cells_c
    num_fine = fine_r * fine_c
    sub2 = ratio * ratio

    fr_, fc_ = cell_coords(pos, fine_r, fine_c, fine_cell_size)
    cr_ = jnp.minimum(fr_ // ratio, cells_r - 1)
    cc_ = jnp.minimum(fc_ // ratio, cells_c - 1)
    coarse = cr_ * cells_c + cc_
    fine_flat = fr_ * fine_c + fc_
    sub = (fr_ - cr_ * ratio) * ratio + (fc_ - cc_ * ratio)
    key = jnp.where(alive, coarse * sub2 + sub, num_coarse * sub2)

    order = jnp.argsort(key, stable=True)
    skey = key[order]
    spos = pos[order]
    sorder = order.astype(jnp.int32)

    # within-fine-cell rank (composite key identifies the fine cell)
    rank_f = (jnp.arange(n, dtype=jnp.int32)
              - jnp.searchsorted(skey, skey, side="left").astype(jnp.int32))
    scoarse = skey // sub2
    rank_c = (jnp.arange(n, dtype=jnp.int32)
              - jnp.searchsorted(scoarse, scoarse,
                                 side="left").astype(jnp.int32))

    valid_c = (scoarse < num_coarse) & (rank_c < cap)
    slot_c = jnp.where(valid_c, scoarse * cap + rank_c, num_coarse * cap)
    sfine = fine_flat[order]
    valid_f = (skey < num_coarse * sub2) & (rank_f < fine_cap)
    slot_f = jnp.where(valid_f, sfine * fine_cap + rank_f,
                       num_fine * fine_cap)

    def scatter(slot, total, val, fill):
        out = jnp.full((total,) + val.shape[1:], fill, val.dtype)
        return out.at[slot].set(val, mode="drop")

    cg = SpatialGrid(
        buckets=scatter(slot_c, num_coarse * cap, sorder,
                        -1).reshape(num_coarse, cap),
        bucket_xy=scatter(slot_c, num_coarse * cap, spos,
                          1e30).reshape(num_coarse, cap, 2),
        cell_of=jnp.where(alive, coarse, num_coarse).astype(jnp.int32),
        bucket_payload=scatter(
            slot_c, num_coarse * cap,
            payload[order].astype(jnp.float32),
            0.0).reshape(num_coarse, cap, payload.shape[1]),
        cells_r=cells_r, cells_c=cells_c, cell_size=cell_size)
    # fine grid: ONE packed scatter (xy | payload | slot)
    q = fine_payload.shape[1]
    pvals = jnp.concatenate([
        spos, fine_payload[order].astype(jnp.float32),
        sorder.astype(jnp.float32)[:, None]], axis=1)       # [N, 2+Q+1]
    fill_row = jnp.concatenate([
        jnp.full((2,), 1e30, jnp.float32), jnp.zeros((q,), jnp.float32),
        jnp.full((1,), -1.0, jnp.float32)])
    packed = jnp.tile(fill_row, (num_fine * fine_cap, 1)).at[slot_f].set(
        pvals, mode="drop")
    fg = ContactGrid(
        packed=packed.reshape(num_fine, fine_cap, 2 + q + 1),
        cell_of=jnp.where(alive, fine_flat, num_fine).astype(jnp.int32),
        cells_r=fine_r, cells_c=fine_c, cell_size=fine_cell_size)
    return cg, fg


def _prewindow(a: jax.Array, cells_r: int, cells_c: int, window: int,
               fill) -> jax.Array:
    """[cells_r*cells_c, cap, ...] -> [cells, W2*cap, ...]: every cell's
    whole (window x window) neighbourhood concatenated, built with W2
    STATIC pad+slice shifts (pure copies, no gathers). Queries then fetch
    one wide row per entity instead of W2 narrow ones — row gathers of
    ~W2*cap*C-float rows are the efficient TPU gather shape (narrow rows
    waste most of each memory tile)."""
    half = window // 2
    tail = a.shape[1:]
    g = a.reshape((cells_r, cells_c) + tail)
    pad = [(half, half), (half, half)] + [(0, 0)] * len(tail)
    gp = jnp.pad(g, pad, constant_values=fill)
    shifts = [
        gp[dr:dr + cells_r, dc:dc + cells_c]
        for dr in range(window) for dc in range(window)
    ]
    out = jnp.stack(shifts, axis=2)                    # [cr, cc, W2, cap,...]
    return out.reshape((cells_r * cells_c, window * window * a.shape[1])
                       + tail[1:])


def central_block_cols(window: int, sub: int, cap: int) -> "np.ndarray":
    """Static column indices selecting the central (sub x sub)-cell blocks
    out of a (window x window) candidate row from `window_candidates`.

    Collision cones only bind within a short horizon, so the HRVO top-k
    can restrict to the centre 3x3 cells (>=16u coverage) of the 5x5
    window the boids forces need — 2.8x less top-k work."""
    assert sub <= window and (window - sub) % 2 == 0
    off = (window - sub) // 2
    cols = []
    for dr in range(off, off + sub):
        for dc in range(off, off + sub):
            b = dr * window + dc
            cols.extend(range(b * cap, (b + 1) * cap))
    return np.asarray(cols, np.int32)


@functools.partial(jax.jit, static_argnames=("window",))
def window_candidates(
    grid: SpatialGrid,
    query_pos: jax.Array,
    query_slot: jax.Array,
    *,
    window: int = 5,
):
    """All bucket candidates in a (window x window)-cell neighbourhood of
    each query point.

    Returns (cand i32[Q, W2*cap], cpos f32[Q, W2*cap, 2],
    cpay f32[Q, W2*cap, P] | None, valid bool[Q, W2*cap]); `valid` excludes
    empty bucket entries and the queryer itself.
    """
    cells_r, cells_c = grid.cells_r, grid.cells_c
    qr, qc = cell_coords(query_pos, cells_r, cells_c, grid.cell_size)
    qcell = qr * cells_c + qc                          # [Q]

    wb = _prewindow(grid.buckets, cells_r, cells_c, window, -1)
    wx = _prewindow(grid.bucket_xy, cells_r, cells_c, window, 1e30)
    cand = wb[qcell]                                   # ONE wide row gather
    cpos = wx[qcell]
    cpay = None
    if grid.bucket_payload is not None:
        wp = _prewindow(grid.bucket_payload, cells_r, cells_c, window, 0.0)
        cpay = wp[qcell]
    valid = (cand >= 0) & (cand != query_slot[:, None])
    return cand, cpos, cpay, valid


@jax.jit
def contact_candidates(
    grid: ContactGrid,
    query_pos: jax.Array,
    query_slot: jax.Array,
):
    """All bucket candidates in the 3x3-cell neighbourhood of each query
    point, gathered as 9 direct row fetches of the PACKED rows per query.

    Built for a FINE contact grid (small cells, small cap): a fine grid
    has far more cells than queriers, so materializing every cell's
    window (`_prewindow`, right for the coarse 16u avoidance grid) would
    copy orders of magnitude more data than the 9 queried rows; and the
    xy/payload/slot channels ride ONE wide row each (narrow rows waste
    most of a memory tile — 27 narrow gathers measured ~4 ms/move-frame
    at 10k contact). Returns (cand i32[Q, 9*cap], cpos f32[Q, 9*cap, 2],
    cpay f32[Q, 9*cap, Q], valid).
    """
    cr, cc = grid.cells_r, grid.cells_c
    qr, qc = cell_coords(query_pos, cr, cc, grid.cell_size)
    cap = grid.packed.shape[1]
    rows, inbs = [], []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            rr, ccol = qr + dr, qc + dc
            inb = (rr >= 0) & (rr < cr) & (ccol >= 0) & (ccol < cc)
            idx = jnp.where(inb, rr * cc + ccol, 0)
            rows.append(grid.packed[idx])           # [Q, cap, C] row gather
            inbs.append(jnp.repeat(inb[:, None], cap, axis=1))
    pk = jnp.concatenate(rows, axis=1)              # [Q, 9*cap, C]
    inb = jnp.concatenate(inbs, axis=1)             # [Q, 9*cap]
    cand = pk[..., -1].astype(jnp.int32)
    cpos = pk[..., 0:2]
    cpay = pk[..., 2:-1]
    valid = inb & (cand >= 0) & (cand != query_slot[:, None])
    return cand, cpos, cpay, valid


@functools.partial(jax.jit, static_argnames=("k", "window"))
def knn_query(
    grid: SpatialGrid,
    pos: jax.Array,
    query_pos: jax.Array,
    query_slot: jax.Array,
    *,
    k: int,
    window: int = 5,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """K nearest indexed entities around each query point.

    Args:
      grid: built spatial index over `pos`.
      pos: f32[N, 2] entity positions the grid indexes.
      query_pos: f32[Q, 2] query points.
      query_slot: i32[Q] arena slot of each queryer (excluded from its own
        results), or -1 for point queries.
      k: max neighbours (the reference caps ClearPath at 32, movement.c:437).
      window: cells-per-side gathered around the query cell. window=5 over
        16-unit cells covers every neighbour within 32 world units.

    Returns:
      (idx i32[Q, k], dist f32[Q, k], valid bool[Q, k], neigh_pos f32[Q, k, 2])
      sorted by distance.
    """
    cand, cpos, _, cvalid = window_candidates(
        grid, query_pos, query_slot, window=window)
    d2 = jnp.sum((cpos - query_pos[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(~cvalid, jnp.inf, d2)

    # approx_max_k: TPU-optimized partial reduction (exact top_k does a
    # full per-row sort). Missing a marginal 33rd-nearest neighbour is
    # within the reference's own truncation semantics (clearpath.c:390).
    neg_d2, top_i = jax.lax.approx_max_k(
        -d2, k, recall_target=0.95, aggregate_to_topk=True)
    idx = jnp.take_along_axis(cand, top_i, axis=1)
    neigh_pos = jnp.take_along_axis(cpos, top_i[..., None], axis=1)
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    valid = jnp.isfinite(neg_d2)
    idx = jnp.where(valid, idx, -1)
    return idx, dist, valid, neigh_pos


@functools.partial(jax.jit, static_argnames=("block",))
def nearest_match(
    query_pos: jax.Array,
    query_mask: jax.Array,
    target_pos: jax.Array,
    target_mask: jax.Array,
    pair_ok: jax.Array,
    *,
    block: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Exact nearest target per queryer with an arbitrary pair predicate.

    Used for combat target acquisition (nearest enemy in vision range,
    ref: src/game/combat.c target acquisition via spatial query) where the
    radius is too large for windowed grid queries. Runs as a scan over
    target blocks so peak memory is [Q, block] instead of [Q, N].

    Args:
      pair_ok: (q_code i32[Q], ok_matrix bool[C, C], t_code i32[N]) —
        pair_ok[q, t] = ok_matrix[q_code[q], t_code[t]]. Internally the
        matrix rows are packed into u32 bitmasks so the per-pair test is an
        elementwise shift, NOT a [Q, block] general gather (which the TPU
        executes element-serially — measured 2.8 s/tick at 16k entities).

    Returns:
      (idx i32[Q] nearest valid target or -1, dist f32[Q]).
    """
    q_code, ok_matrix, t_code = pair_ok
    c = ok_matrix.shape[0]
    assert c <= 32, "pair-code matrix packed into u32 bits"
    # row_bits[f] has bit g set iff ok_matrix[f, g]
    row_bits = jnp.sum(
        ok_matrix.astype(jnp.uint32) << jnp.arange(c, dtype=jnp.uint32)[None, :],
        axis=1)
    t_bits = row_bits[jnp.clip(t_code, 0, c - 1)]      # small gather: [N]<-[C]
    q_shift = jnp.clip(q_code, 0, c - 1).astype(jnp.uint32)

    n = target_pos.shape[0]
    num_blocks = -(-n // block)
    pad = num_blocks * block - n
    tpos = jnp.pad(target_pos, ((0, pad), (0, 0)))
    tmask = jnp.pad(target_mask, (0, pad))
    tbits = jnp.pad(t_bits, (0, pad))
    tpos = tpos.reshape(num_blocks, block, 2)
    tmask = tmask.reshape(num_blocks, block)
    tbits = tbits.reshape(num_blocks, block)
    tidx = jnp.arange(num_blocks * block, dtype=jnp.int32).reshape(num_blocks, block)

    def body(carry, blk):
        best_d2, best_i = carry
        bpos, bmask, bbits, bidx = blk
        d2 = jnp.sum((query_pos[:, None, :] - bpos[None, :, :]) ** 2, axis=-1)
        ok = bmask[None, :] & (
            ((bbits[None, :] >> q_shift[:, None]) & 1) == 1)
        d2 = jnp.where(ok, d2, jnp.inf)
        bd2 = jnp.min(d2, axis=1)
        bi = bidx[jnp.argmin(d2, axis=1)]
        better = bd2 < best_d2
        return (jnp.where(better, bd2, best_d2), jnp.where(better, bi, best_i)), None

    init = (jnp.full(query_pos.shape[0], jnp.inf), jnp.full(query_pos.shape[0], -1, jnp.int32))
    (best_d2, best_i), _ = jax.lax.scan(body, init, (tpos, tmask, tbits, tidx))
    best_i = jnp.where(query_mask & jnp.isfinite(best_d2), best_i, -1)
    return best_i, jnp.sqrt(jnp.where(jnp.isfinite(best_d2), best_d2, jnp.inf))
