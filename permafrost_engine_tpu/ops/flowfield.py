"""Flow-field integration, direction quantization, and LOS fields.

The reference builds per-chunk 64x64 fields with a serial priority-queue
Dijkstra (ref: src/navigation/field.c:539-566) and quantizes downhill
directions to 4-bit codes (ref: field.c:734-828). Priority queues don't
vectorize, so the TPU formulation is *batched min-plus relaxation*
(Bellman-Ford over the 8-neighbour stencil): every iteration each tile takes
the min over its neighbours' integration costs plus the octile step cost.
One iteration advances every wavefront one tile in all directions, so
convergence needs exactly `longest geodesic` iterations — and an entire
batch of chunks relaxes simultaneously as one [K, 64, 64] tensor on the VPU.

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    FIELD_RES,
    FLOW_DIR_OFFSETS,
    INF_COST,
)

SQRT2 = 1.4142135623730951

# Neighbour offsets in FlowDir order (codes 1..8): NW N NE W E SW S SE
_OFFSETS = FLOW_DIR_OFFSETS[1:]
_STEP_LEN = tuple(SQRT2 if (dr != 0 and dc != 0) else 1.0 for dr, dc in _OFFSETS)


def shift2d(x: jax.Array, dr: int, dc: int, fill) -> jax.Array:
    """Value of the neighbour at (r+dr, c+dc) for every tile; `fill` outside.

    Operates on the last two dims; any leading batch dims pass through.
    """
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, constant_values=fill)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, 1 + dr, 1 + dr + h, axis=-2),
        1 + dc, 1 + dc + w, axis=-1,
    )



def _shiftk(x: jax.Array, dr: int, dc: int, fill) -> jax.Array:
    """shift2d for arbitrary static offsets (pads by |dr|/|dc|)."""
    h, w = x.shape[-2], x.shape[-1]
    pr, pc = abs(dr), abs(dc)
    pad = [(0, 0)] * (x.ndim - 2) + [(pr, pr), (pc, pc)]
    xp = jnp.pad(x, pad, constant_values=fill)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, pr + dr, pr + dr + h, axis=-2),
        pc + dc, pc + dc + w, axis=-1,
    )

def _neighbour_allowed_masks(passable: jax.Array) -> list[jax.Array]:
    """Per-offset masks: can a step arrive from the neighbour at that offset?

    Diagonal moves require both adjacent orthogonal tiles passable — no
    corner-cutting (matches N_GridNeighbours, ref: src/navigation/nav.c:4881).
    """
    masks = []
    for dr, dc in _OFFSETS:
        if dr != 0 and dc != 0:
            masks.append(
                shift2d(passable, dr, 0, False) & shift2d(passable, 0, dc, False)
            )
        else:
            masks.append(None)  # orthogonal: always allowed
    return masks


def _relax_once(
    integ: jax.Array,
    step_cost: jax.Array,
    passable: jax.Array,
    allowed: list[jax.Array],
) -> jax.Array:
    """One min-plus relaxation over the 8-neighbour octile stencil."""
    best = integ
    for (dr, dc), slen, mask in zip(_OFFSETS, _STEP_LEN, allowed):
        cand = shift2d(integ, dr, dc, INF_COST) + step_cost * slen
        if mask is not None:
            cand = jnp.where(mask, cand, INF_COST)
        best = jnp.minimum(best, cand)
    return jnp.where(passable, best, INF_COST)


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "check_every", "unroll"))
def integrate(
    cost: jax.Array,
    seed_mask: jax.Array,
    seed_cost: jax.Array | None = None,
    *,
    max_iters: int = 4 * FIELD_RES,
    check_every: int = 16,
    unroll: int = 8,
) -> jax.Array:
    """Batched integration-field build.

    Args:
      cost: u8[..., H, W] entry cost per nav tile, COST_IMPASSABLE blocked
        (ref: src/navigation/nav_data.h:47).
      seed_mask: bool[..., H, W] target tiles (integration cost 0). The
        reference's TARGET_PORTAL/TILE/ENEMIES variants (ref: field.h:79-101)
        all reduce to a seed mask here.
      seed_cost: optional f32[..., H, W] initial cost per seed tile —
        seeding portal spans with their remaining path-to-goal cost makes a
        union field over multiple seed classes globally consistent (used
        when a path exits and re-enters a chunk).
      max_iters: relaxation bound (4*FIELD_RES covers any serpentine path
        within a chunk-sized field).
      check_every: convergence-test stride (each test is a device-wide
        reduction; amortize it).
      unroll: relaxations fused per loop trip — raises single-field latency
        throughput at some graph-size (compile time) cost.

    Returns:
      f32[..., H, W] integration cost, INF_COST where unreachable/blocked.
    """
    passable = cost != COST_IMPASSABLE
    step_cost = jnp.where(passable, cost.astype(jnp.float32), INF_COST)
    sc = 0.0 if seed_cost is None else seed_cost
    integ0 = jnp.where(seed_mask & passable, sc, INF_COST).astype(jnp.float32)
    allowed = _neighbour_allowed_masks(passable)

    def cond(carry):
        i, integ, done = carry
        return (~done) & (i < max_iters)

    def body(carry):
        i, integ, _ = carry
        # inner fori over `unroll`-relax bundles: loop-trip overhead is the
        # single-field latency driver; graph size is the compile-time driver
        def bundle(_, x):
            for _ in range(unroll):
                x = _relax_once(x, step_cost, passable, allowed)
            return x

        new = jax.lax.fori_loop(0, check_every // unroll, bundle, integ)
        done = jnp.all(new == integ)
        return i + check_every, new, done

    _, integ, _ = jax.lax.while_loop(
        cond, body, (jnp.array(0, jnp.int32), integ0, jnp.array(False))
    )
    # Re-seed (seeds on impassable tiles stay INF like the reference,
    # which rejects blocked targets upstream).
    return jnp.where(seed_mask & passable, sc, integ)


@jax.jit
def flow_dirs(integ: jax.Array, cost: jax.Array) -> jax.Array:
    """Quantize downhill directions (ref: src/navigation/field.c:734-828).

    Each tile points at its lowest-integration passable neighbour; tiles
    that are themselves targets (integration 0), blocked, or unreachable
    get FlowDir.NONE. Returns u8[..., H, W] FlowDir codes.
    """
    passable = cost != COST_IMPASSABLE
    neigh = jnp.stack(
        [shift2d(integ, dr, dc, INF_COST) for dr, dc in _OFFSETS], axis=-1
    )
    # Same corner-cutting rule as integration so descent is always possible.
    masks = _neighbour_allowed_masks(passable)
    allowed = jnp.stack(
        [m if m is not None else jnp.ones(integ.shape, jnp.bool_) for m in masks],
        axis=-1,
    )
    neigh = jnp.where(allowed, neigh, INF_COST)

    # tie-break toward orthogonal directions: a full-edge portal seed makes
    # S and SW neighbours equal, and argmin's first-index rule would send
    # the whole chunk marching diagonally into a side wall
    diag_penalty = jnp.asarray(
        [1e-3 if (dr and dc) else 0.0 for dr, dc in _OFFSETS], jnp.float32)
    neigh_ranked = neigh + diag_penalty
    best_idx = jnp.argmin(neigh_ranked, axis=-1)
    best_val = jnp.min(neigh, axis=-1)
    have_dir = passable & (best_val < INF_COST) & (integ > 0.0) & (integ < INF_COST)
    return jnp.where(have_dir, best_idx.astype(jnp.uint8) + 1, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def los_field_iter(
    passable: jax.Array,
    goal_r: jax.Array,
    goal_c: jax.Array,
    *,
    max_iters: int = 2 * FIELD_RES,
) -> jax.Array:
    """Reference-recurrence LOS field by fixed-point iteration — the direct
    transcription of the rule, kept as the oracle for `los_field` (which
    evaluates the same recurrence in closed form ~50x faster).

    A tile has LOS if it is passable and its neighbour one step *toward* the
    goal (octile direction) has LOS; diagonal steps additionally require both
    adjacent orthogonal tiles passable (no corner peeking). Computed by
    monotone fixed-point iteration, batched over leading dims of `passable`
    with scalar (or matching-batch) goal coordinates
    (ref: src/navigation/field.c:435-537).

    Returns u8[..., H, W], 1 where visible.
    """
    h, w = passable.shape[-2], passable.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    goal_r = jnp.asarray(goal_r)[..., None, None]
    goal_c = jnp.asarray(goal_c)[..., None, None]
    dr = jnp.sign(goal_r - rows)  # step toward goal: -1/0/+1
    dc = jnp.sign(goal_c - cols)

    los0 = (rows == goal_r) & (cols == goal_c) & passable

    def upstream(los, sr, sc):
        """los value of the neighbour at (r+sr, c+sc), where sr/sc are
        per-tile -1/0/+1 arrays: gather via the 9 static shifts."""
        out = jnp.zeros_like(los)
        for odr in (-1, 0, 1):
            for odc in (-1, 0, 1):
                if odr == 0 and odc == 0:
                    continue
                sel = (sr == odr) & (sc == odc)
                out = jnp.where(sel, shift2d(los, odr, odc, False), out)
        return out

    pass_toward_r = upstream(passable, dr, jnp.zeros_like(dc))
    pass_toward_c = upstream(passable, jnp.zeros_like(dr), dc)
    diag = (dr != 0) & (dc != 0)
    corner_ok = jnp.where(diag, pass_toward_r & pass_toward_c, True)

    def cond(carry):
        i, los, done = carry
        return (~done) & (i < max_iters)

    def body(carry):
        i, los, _ = carry
        new = jax.lax.fori_loop(
            0, 8,
            lambda _, x: x | (upstream(x, dr, dc) & passable & corner_ok),
            los)
        return i + 8, new, jnp.all(new == los)

    _, los, _ = jax.lax.while_loop(
        cond, body, (jnp.array(0, jnp.int32), los0, jnp.array(False))
    )
    return los.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def los_field(
    passable: jax.Array,
    goal_r: jax.Array,
    goal_c: jax.Array,
    *,
    max_iters: int | None = None,
) -> jax.Array:
    """Line-of-sight field from a goal tile (ref: src/navigation/field.c:435-537).

    Same recurrence as `los_field_iter` — los(t) = AND of ok(u) along the
    octile sign-step path t -> goal (ok = passable, plus both orthogonal
    step-tiles passable on diagonal steps) — but evaluated in CLOSED FORM.
    The sign-step path is a diagonal run with constant direction inside
    each goal quadrant, followed by a straight run along the goal row or
    column, so the whole field is:

      * two 1D prefix-ANDs outward from the goal on its row/column
        (cumsum of blockers == 0),
      * those 1D tables SHEARED into crossing-point planes by
        log-doubling column/row shifts keyed on the bits of |dr| / |dc|,
      * four per-quadrant diagonal suffix-ANDs by log-doubling diagonal
        shifts (tiles outside the strict quadrant contribute True).

    ~50 static VPU passes replace the iterative version's O(map diameter)
    sequential sweeps (measured ~6 ms -> ~0.15 ms per whole-map build
    through the relay); results are bit-identical (tests/test_flowfield.py
    parity suite). `max_iters` is accepted for API compatibility and
    ignored — the closed form has no iteration count.

    Returns u8[..., H, W], 1 where visible.
    """
    del max_iters
    h, w = passable.shape[-2], passable.shape[-1]
    p = passable.astype(bool)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    gr = jnp.asarray(goal_r, jnp.int32)[..., None, None]
    gc = jnp.asarray(goal_c, jnp.int32)[..., None, None]
    dr = gr - rows                       # [..., h, w]
    dc = gc - cols
    sr = jnp.sign(dr)
    sc = jnp.sign(dc)
    adr = jnp.abs(dr)
    adc = jnp.abs(dc)
    nbits = max(h - 1, w - 1).bit_length()

    # ---- 1D prefix-AND tables outward from the goal on its row/column ----
    # row_tab[..., c] = AND of passable on row gr over the span [c..gc]
    # (inclusive of both — the goal's own passability gates everything,
    # matching los0 = goal & passable in the recurrence).
    grow = jnp.broadcast_to(jnp.clip(gr, 0, h - 1), (*p.shape[:-2], 1, w))
    prow = jnp.take_along_axis(p, grow, axis=-2)[..., 0, :]     # [..., w]
    gcol = jnp.broadcast_to(jnp.clip(gc, 0, w - 1), (*p.shape[:-2], h, 1))
    pcol = jnp.take_along_axis(p, gcol, axis=-1)[..., 0]        # [..., h]

    def prefix_and_1d(v, gpos, n):
        idx = jax.lax.iota(jnp.int32, n)
        blk = (~v).astype(jnp.int32)
        right = jnp.cumsum(jnp.where(idx >= gpos, blk, 0), axis=-1)
        left = jnp.flip(
            jnp.cumsum(jnp.flip(jnp.where(idx <= gpos, blk, 0), -1), -1), -1)
        return jnp.where(idx >= gpos, right == 0, left == 0)

    row_tab = prefix_and_1d(prow, gc[..., 0, :], w)             # [..., w]
    col_tab = prefix_and_1d(pcol, gr[..., :, 0], h)             # [..., h]

    # ---- shear the tables into crossing-point planes ---------------------
    # C_row[..., r, c] = row_tab[..., c + |dr| * sc]: the straight-run AND
    # from where the diagonal run meets the goal row.  Valid only where
    # |dr| <= |dc| (in-case tiles never shear past the goal, so the
    # per-element shift direction sc is constant along the whole shear).
    def shear(tab2d, amount, sgn, axis_dc):
        x = tab2d
        for k in range(nbits):
            s = 1 << k
            bit = ((amount >> k) & 1) == 1
            if axis_dc:
                xp = _shiftk(x, 0, s, False)
                xm = _shiftk(x, 0, -s, False)
            else:
                xp = _shiftk(x, s, 0, False)
                xm = _shiftk(x, -s, 0, False)
            x = jnp.where(bit & (sgn > 0), xp,
                          jnp.where(bit & (sgn < 0), xm, x))
        return x

    c_row = shear(jnp.broadcast_to(row_tab[..., None, :], (*row_tab.shape[:-1], h, w)),
                  adr, sc, axis_dc=True)
    c_col = shear(jnp.broadcast_to(col_tab[..., :, None], (*col_tab.shape[:-1], h, w)),
                  adc, sr, axis_dc=False)
    c_sel = jnp.where(adr <= adc, c_row, c_col)

    # ---- per-quadrant diagonal suffix-ANDs -------------------------------
    # D_q(t) = AND of ok_diag over the diagonal ray from t while it stays
    # strictly inside quadrant q (both deltas nonzero); outside tiles and
    # out-of-map tiles contribute True, so the doubling AND over the full
    # 2^nbits ray equals the AND over exactly the m = min(|dr|,|dc|)
    # diagonal steps of the path.
    quad = jnp.zeros(jnp.broadcast_shapes(p.shape, sr.shape), bool)
    for qr in (-1, 1):
        for qc in (-1, 1):
            ok = p & shift2d(p, qr, 0, False) & shift2d(p, 0, qc, False)
            mask = (sr == qr) & (sc == qc)
            d = jnp.where(mask, ok, True)
            for k in range(nbits):
                s = 1 << k
                d = d & _shiftk(d, qr * s, qc * s, True)
            quad = jnp.where(mask, d & c_sel, quad)

    los = jnp.where(dr == 0, jnp.broadcast_to(row_tab[..., None, :], quad.shape),
                    jnp.where(dc == 0,
                              jnp.broadcast_to(col_tab[..., :, None], quad.shape),
                              quad))
    return los.astype(jnp.uint8)


def seed_from_point(h: int, w: int, r, c) -> jax.Array:
    """bool[h, w] seed mask with a single tile set (dynamic indices ok)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (rows == r) & (cols == c)


# FlowDir code -> unit world-direction (x=east/cols+, z=south/rows+).
# Index 0 (NONE) maps to the zero vector.
_DIR_TABLE = jnp.array(
    [[float(dc), float(dr)] for dr, dc in FLOW_DIR_OFFSETS], dtype=jnp.float32
)
_norm = jnp.linalg.norm(_DIR_TABLE, axis=1, keepdims=True)
DIR_UNIT_TABLE = jnp.where(_norm > 0, _DIR_TABLE / jnp.maximum(_norm, 1e-9), 0.0)


def dir_code_to_vec(codes: jax.Array) -> jax.Array:
    """Map u8 FlowDir codes to f32 unit vectors [..., 2] (x, z).

    One-hot contraction instead of a table gather: per-element gathers
    run ~1 elem/cycle on TPU, while the [.., 9] @ [9, 2] contraction is
    pure VPU work."""
    k = DIR_UNIT_TABLE.shape[0]
    oh = (codes.astype(jnp.int32)[..., None]
          == jnp.arange(k, dtype=jnp.int32)).astype(jnp.float32)
    return oh @ DIR_UNIT_TABLE
