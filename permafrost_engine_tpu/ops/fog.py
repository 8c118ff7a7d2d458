"""Fog-of-war visibility as scatter + disc convolution.

The reference keeps per-faction vision refcounts per tile, updated
incrementally with SIMD disc stamps when units move
(ref: src/game/fog_of_war.c:203-354). The TPU formulation recomputes
visibility densely each update: entities scatter-add into per-(faction,
radius-bucket) occupancy grids, each bucket is convolved with its disc
kernel (XLA convolution — this is where the MXU eats the work), and a tile
is VISIBLE where any disc covers it. Explored memory (UNEXPLORED -> IN_FOG)
is a running max, exactly the reference's 2-bit state ladder
(fog_of_war.c:163-177).

On uneven terrain the disc path is replaced by the batched shadowcaster
(ops/shadowcast.py), mirroring the reference's stamp-vs-cast_light switch
(fog_of_war.c:427-541).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import FogState, UNITS_PER_TILE

# Vision radii quantized to buckets, in map tiles (ref vision ranges are
# per-entity floats; bucketing keeps the number of disc kernels static).
VISION_BUCKET_RADII = (4, 8, 12, 16)


@functools.cache
def _disc_kernel(radius: int) -> np.ndarray:
    k = 2 * radius + 1
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    return ((x * x + y * y) <= radius * radius).astype(np.float32)


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
        from permafrost_engine_tpu.ops.shadowcast import shadowcast_visibility

        visible = shadowcast_visibility(
            jnp.stack([r, c], axis=1),
            alive & (faction >= 0) & (vision_range > 0),
            faction, vr_tiles, tile_height,
            radius=VISION_BUCKET_RADII[-1],
            tiles_h=tiles_h, tiles_w=tiles_w, max_factions=max_factions)
    else:
        chan = faction * nb + bucket
        nchan = max_factions * nb
        flat = jnp.where(alive & (faction >= 0) & (vision_range > 0),
                         chan * (tiles_h * tiles_w) + r * tiles_w + c,
                         nchan * tiles_h * tiles_w)
        occ = jnp.zeros((nchan * tiles_h * tiles_w,), jnp.float32)
        occ = occ.at[flat].add(1.0, mode="drop")
        occ = occ.reshape(max_factions, nb, tiles_h, tiles_w)

        vis = jnp.zeros((max_factions, tiles_h, tiles_w), jnp.bool_)
        for b, rad in enumerate(VISION_BUCKET_RADII):
            kern = jnp.asarray(_disc_kernel(rad))[None, None, :, :]
            out = jax.lax.conv_general_dilated(
                occ[:, b].reshape(max_factions, 1, tiles_h, tiles_w), kern,
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ).reshape(max_factions, tiles_h, tiles_w)
            vis = vis | (out > 0.5)

        visible = vis
    explored = fog_state > FogState.UNEXPLORED
    new = jnp.where(
        visible, jnp.uint8(FogState.VISIBLE),
        jnp.where(explored, jnp.uint8(FogState.IN_FOG),
                  jnp.uint8(FogState.UNEXPLORED)))
    return jnp.where(enabled, new, jnp.uint8(FogState.VISIBLE))
