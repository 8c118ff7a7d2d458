"""Fog-of-war visibility as scatter + iterated octagonal dilation.

The reference keeps per-faction vision refcounts per tile, updated
incrementally with SIMD disc stamps when units move
(ref: src/game/fog_of_war.c:203-354). The TPU formulation recomputes
visibility densely each update: entities scatter into per-(faction,
radius-bucket) occupancy grids, and the buckets are dilated to their
radii with a cascade of 3-wide max reduce_windows — full (Chebyshev) and
cross (Manhattan) steps mixed so each bucket's reach is a near-exact
octagonal disc. Dilation distributes over union, so the four buckets
share one cascade: dilate the largest bucket, OR in the next, repeat
(16 one-dimensional reduce_windows total — measured ~10x faster than
single-channel disc convolutions, which cannot use the MXU). Explored
memory (UNEXPLORED -> IN_FOG) is a running max, exactly the reference's
2-bit state ladder (fog_of_war.c:163-177).

On uneven terrain this path is replaced by the batched shadowcaster
(ops/shadowcast.py), mirroring the reference's stamp-vs-cast_light switch
(fog_of_war.c:427-541).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import FogState, UNITS_PER_TILE

# Vision radii quantized to buckets, in map tiles (ref vision ranges are
# per-entity floats; bucketing keeps the number of disc kernels static).
VISION_BUCKET_RADII = (4, 8, 12, 16)


# per 4-tile radius increment: (full 3x3 steps, cross steps). Full steps
# grow Chebyshev+Manhattan reach by 1 each; cross steps Manhattan only.
# Cumulative (full, cross) after stage k = ((2,2),(3,5),(5,7),(7,9)):
# Chebyshev reach 4/8/12/16 and diagonal reach 6/11/17/23 vs the exact
# disc's 5.7/11.3/17.0/22.6 — a near-exact octagon per bucket.
_DILATE_STAGES = ((2, 2), (1, 3), (2, 2), (2, 2))


def _rw_max(x, window):
    zero = jnp.zeros((), x.dtype)
    return jax.lax.reduce_window(x, zero, jax.lax.max, window,
                                 (1,) * x.ndim, "SAME")


def _dilate_stage(x: jax.Array, full: int, cross: int) -> jax.Array:
    """Grow a [..., H, W] u8 occupancy mask by one radius increment."""
    nd = x.ndim
    row = (1,) * (nd - 2) + (3, 1)
    col = (1,) * (nd - 2) + (1, 3)
    for _ in range(full):
        x = _rw_max(_rw_max(x, row), col)
    for _ in range(cross):
        x = jnp.maximum(_rw_max(x, row), _rw_max(x, col))
    return x


@functools.partial(jax.jit, static_argnames=("tiles_h", "tiles_w", "max_factions"))
def update_fog(
    fog_state: jax.Array,     # u8[F, TH, TW]
    enabled: jax.Array,       # bool[]
    pos: jax.Array,           # f32[N,2]
    alive: jax.Array,         # bool[N]
    faction: jax.Array,       # i32[N]
    vision_range: jax.Array,  # f32[N] world units
    tile_height: jax.Array | None = None,   # f32[TH, TW] terrain heights
    *,
    tiles_h: int,
    tiles_w: int,
    max_factions: int,
) -> jax.Array:
    n = pos.shape[0]
    nb = len(VISION_BUCKET_RADII)
    radii = jnp.asarray(VISION_BUCKET_RADII, jnp.float32)

    c = jnp.clip((pos[:, 0] / UNITS_PER_TILE).astype(jnp.int32), 0, tiles_w - 1)
    r = jnp.clip((pos[:, 1] / UNITS_PER_TILE).astype(jnp.int32), 0, tiles_h - 1)
    vr_tiles = vision_range / UNITS_PER_TILE
    # smallest bucket covering the range (clamped to the largest)
    bucket = jnp.sum((vr_tiles[:, None] > radii[None, :]), axis=1)
    bucket = jnp.clip(bucket, 0, nb - 1)

    # Height-aware path: the reference switches from disc stamps to
    # recursive shadowcasting on uneven terrain (fog_of_war.c:427-541);
    # here it is the batched ring-DP shadowcaster (ops/shadowcast.py),
    # exact per viewer — ridge back-shadows really occlude.
    if tile_height is not None:
        import os

        from permafrost_engine_tpu.ops.shadowcast import shadowcast_visibility

        ok = alive & (faction >= 0) & (vision_range > 0)
        # DEDUPE viewers by (faction, tile): a packed battle crowd stands
        # many units per fog tile, and same-tile viewers with the max
        # vision see a superset of the rest — EXACT, and it shrinks the
        # O(N x window^2) shadowcast tensor ~4x at 10k fighters. Capacity
        # max(1024, N/4) unique tiles; overflow tiles (beyond any
        # realistic spread) degrade to no vision until the next update.
        cap = max(1024, n // 4)
        big = jnp.int32(max_factions * tiles_h * tiles_w)
        key = jnp.where(ok, jnp.clip(faction, 0, max_factions - 1)
                        * (tiles_h * tiles_w) + r * tiles_w + c, big)
        # per-(faction, tile) max vision (dense scatter-max)
        visg = jnp.zeros((max_factions * tiles_h * tiles_w + 1,),
                         jnp.float32).at[key].max(vr_tiles, mode="drop")
        skeys = jnp.sort(key)
        first = (skeys != jnp.concatenate(
            [jnp.full((1,), -1, skeys.dtype), skeys[:-1]])) & (skeys < big)
        upos = jnp.cumsum(first) - 1
        slot = jnp.where(first & (upos < cap), upos, cap)
        ukeys = jnp.full((cap + 1,), big, jnp.int32).at[slot].set(
            skeys, mode="drop")[:cap]
        uvalid = ukeys < big
        uk = jnp.where(uvalid, ukeys, 0)
        uf = uk // (tiles_h * tiles_w)
        ur = (uk % (tiles_h * tiles_w)) // tiles_w
        uc = uk % tiles_w
        uvis = visg[jnp.where(uvalid, ukeys, big)]
        visible = shadowcast_visibility(
            jnp.stack([ur, uc], axis=1).astype(jnp.int32),
            uvalid, uf.astype(jnp.int32), uvis, tile_height,
            radius=VISION_BUCKET_RADII[-1],
            tiles_h=tiles_h, tiles_w=tiles_w, max_factions=max_factions,
            exact=os.environ.get("PFTPU_EXACT_FOG") == "1")
    else:
        chan = faction * nb + bucket
        nchan = max_factions * nb
        flat = jnp.where(alive & (faction >= 0) & (vision_range > 0),
                         chan * (tiles_h * tiles_w) + r * tiles_w + c,
                         nchan * tiles_h * tiles_w)
        occ = jnp.zeros((nchan * tiles_h * tiles_w,), jnp.uint8)
        occ = occ.at[flat].max(1, mode="drop")
        occ = occ.reshape(max_factions, nb, tiles_h, tiles_w)

        # shared dilation cascade, largest bucket first: dilation
        # distributes over union, so bucket b joins after (nb-b) stages
        # and receives exactly its radius
        x = occ[:, nb - 1]
        for i, (full, cross) in enumerate(reversed(_DILATE_STAGES)):
            x = _dilate_stage(x, full, cross)
            if i < nb - 1:
                x = jnp.maximum(x, occ[:, nb - 2 - i])
        visible = x > 0
    explored = fog_state > FogState.UNEXPLORED
    new = jnp.where(
        visible, jnp.uint8(FogState.VISIBLE),
        jnp.where(explored, jnp.uint8(FogState.IN_FOG),
                  jnp.uint8(FogState.UNEXPLORED)))
    return jnp.where(enabled, new, jnp.uint8(FogState.VISIBLE))
