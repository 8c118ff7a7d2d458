"""Per-entity desired-velocity sampling from the flow-field slab.

Equivalent of the reference's N_DesiredPointSeekVelocity with bilinear
flow-dir interpolation across chunk borders (ref: src/navigation/nav.c:
3401-3468): each entity samples the 4 nav tiles around its position,
resolves each tile's chunk through its flock's chunk->slab-slot table,
decodes the quantized FlowDir, and blends the 4 unit vectors bilinearly.
Chunk crossings need no special casing — the slot table *is* the stitching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import FIELD_RES, NAV_TILE_SIZE
from permafrost_engine_tpu.ops.flowfield import dir_code_to_vec


def _slab_fetch(slab: jax.Array, row_idx: jax.Array, lr: jax.Array,
                lc: jax.Array) -> jax.Array:
    """Fetch slab[row_idx, lr, lc] per entity WITHOUT an element gather:
    one row gather (the efficient TPU gather shape) + an in-row one-hot
    extract. Element gathers run ~1 elem/cycle; a 64-u8 row costs the
    same as one element. Index arrays may be [N] or [N, S] (S samples per
    entity fetched in ONE gather pass — 4x fewer passes for the bilinear
    corner fetches than calling this per corner)."""
    row = slab[row_idx, lr]                                # [..., W] rows
    w = slab.shape[2]
    oh = (jnp.arange(w, dtype=jnp.int32) == lc[..., None])
    return jnp.sum(jnp.where(oh, row, 0).astype(jnp.int32), axis=-1)


@functools.partial(jax.jit, static_argnames=("chunks_r", "chunks_c"))
def flow_velocity(
    pos: jax.Array,          # f32[N,2] world (x,z)
    flock: jax.Array,        # i32[N] flock id or -1
    field_slot: jax.Array,   # i32[F, num_chunks] flock chunk->slab slot
    flow_slab: jax.Array,    # u8[S, FIELD_RES, FIELD_RES]
    global_slot: jax.Array | None = None,   # i32[F] whole-map field slot
    global_flow: jax.Array | None = None,   # u8[G, H, W]
    ent_gslot: jax.Array | None = None,     # i32[N] per-entity whole-map
                                            # slot (combat chase field),
                                            # used when the entity has no
                                            # flock
    *,
    chunks_r: int,
    chunks_c: int,
) -> tuple[jax.Array, jax.Array]:
    """Sample flow direction per entity.

    A flock with a whole-map field (enemy-seek/surround, the reference's
    TARGET_ENEMIES/TARGET_ENTITY fields) samples it directly; otherwise the
    per-chunk slab is resolved through the flock's chunk->slot table.
    Flockless entities with `ent_gslot >= 0` (combat chasers) sample that
    whole-map field.

    Returns:
      dir: f32[N,2] blended unit direction (zero where no field data).
      has_field: bool[N] any sampled corner had a built field with a dir.
    """
    n = pos.shape[0]
    field_h = chunks_r * FIELD_RES
    field_w = chunks_c * FIELD_RES

    # continuous tile coords; tile centers at (i + 0.5) * NAV_TILE_SIZE
    fx = pos[:, 0] / NAV_TILE_SIZE - 0.5
    fz = pos[:, 1] / NAV_TILE_SIZE - 0.5
    c0 = jnp.floor(fx).astype(jnp.int32)
    r0 = jnp.floor(fz).astype(jnp.int32)
    wx = fx - c0
    wz = fz - r0

    fl = jnp.maximum(flock, 0)
    no_flock = flock < 0
    if global_slot is not None:
        gslot = global_slot[fl]
        use_global = (gslot >= 0) & ~no_flock
    else:
        gslot = jnp.full((n,), -1, jnp.int32)
        use_global = jnp.zeros((n,), jnp.bool_)
    if ent_gslot is not None:
        use_ent = no_flock & (ent_gslot >= 0)
        gslot = jnp.where(use_ent, ent_gslot, gslot)
        use_global = use_global | use_ent

    # All 4 bilinear corners fetched in ONE row-gather pass per slab
    # ([N,4] indices into _slab_fetch) instead of 4 separate passes —
    # gather PASSES, not bytes, are the cost on TPU (see _slab_fetch).
    rc = jnp.clip(jnp.stack([r0, r0, r0 + 1, r0 + 1], axis=1),
                  0, field_h - 1)                     # [N,4]
    cc = jnp.clip(jnp.stack([c0, c0 + 1, c0, c0 + 1], axis=1),
                  0, field_w - 1)
    chunk = (rc // FIELD_RES) * chunks_c + (cc // FIELD_RES)     # [N,4]
    # chunk->slot resolve: one row gather of the flock's slot row + a
    # one-hot extract per corner (the table rows are tiny)
    frow = field_slot[fl]                             # [N, num_chunks]
    slot = jnp.sum(jnp.where(
        jnp.arange(frow.shape[1], dtype=jnp.int32) == chunk[..., None],
        frow[:, None, :], 0), axis=-1)                # [N,4]
    code = _slab_fetch(flow_slab, jnp.maximum(slot, 0),
                       rc % FIELD_RES, cc % FIELD_RES)           # [N,4]
    has = (slot >= 0) & ~no_flock[:, None]
    if global_flow is not None:
        g4 = jnp.broadcast_to(jnp.maximum(gslot, 0)[:, None], rc.shape)
        gcode = _slab_fetch(global_flow, g4, rc, cc)
        code = jnp.where(use_global[:, None], gcode, code)
        has = has | use_global[:, None]
    vec = dir_code_to_vec(jnp.where(has, code, 0))    # [N,4,2]
    hasd = has & (code > 0)
    v00, v01, v10, v11 = (vec[:, 0], vec[:, 1], vec[:, 2], vec[:, 3])
    h00, h01, h10, h11 = (hasd[:, 0], hasd[:, 1], hasd[:, 2], hasd[:, 3])

    w00 = ((1 - wz) * (1 - wx))[:, None]
    w01 = ((1 - wz) * wx)[:, None]
    w10 = (wz * (1 - wx))[:, None]
    w11 = (wz * wx)[:, None]

    blend = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    norm = jnp.linalg.norm(blend, axis=-1, keepdims=True)
    direction = jnp.where(norm > 1e-6, blend / jnp.maximum(norm, 1e-6), 0.0)
    has_field = h00 | h01 | h10 | h11
    return jnp.where(has_field[:, None], direction, 0.0), has_field


@functools.partial(jax.jit, static_argnames=("chunks_r", "chunks_c"))
def dest_los(
    pos: jax.Array,          # f32[N,2]
    flock: jax.Array,        # i32[N]
    los_slot: jax.Array,     # i32[F, num_chunks]
    los_slab: jax.Array,     # u8[S, FIELD_RES, FIELD_RES]
    *,
    chunks_r: int,
    chunks_c: int,
) -> jax.Array:
    """Per-entity line-of-sight to the flock destination, sampled from the
    LOS slab at the entity's nav tile (ref: N_HasDestLOS / compute_los_state,
    movement.c:4129). Returns bool[N]; false where no LOS field exists."""
    field_h = chunks_r * FIELD_RES
    field_w = chunks_c * FIELD_RES
    c = jnp.clip((pos[:, 0] / NAV_TILE_SIZE).astype(jnp.int32), 0, field_w - 1)
    r = jnp.clip((pos[:, 1] / NAV_TILE_SIZE).astype(jnp.int32), 0, field_h - 1)
    chunk = (r // FIELD_RES) * chunks_c + (c // FIELD_RES)
    fl = jnp.maximum(flock, 0)
    slot = los_slot[fl, chunk]
    val = _slab_fetch(los_slab, jnp.maximum(slot, 0), r % FIELD_RES,
                      c % FIELD_RES)
    return (flock >= 0) & (slot >= 0) & (val > 0)
