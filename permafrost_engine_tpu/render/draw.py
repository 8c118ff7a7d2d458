"""Draw-buffer emission: culling, instance transforms, minimap, healthbars.

The reference's render producer side records GL commands per frame
(ref: src/game/game.c:2163-2359 — vis culling + draw-list build in
G_Update, render-input assembly in G_Render). The TPU engine's
presentation contract is *arrays, not commands*: one device pass culls
the arena against the camera frustum and emits instance model matrices,
healthbar fractions and minimap dots; a host renderer (or test) consumes
them. GPU skinning palettes come from render/anim_system.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import (
    EngineConfig,
    EntityFlags,
    FogState,
)


@functools.partial(jax.jit, static_argnames=())
def cull_and_emit(
    pos: jax.Array,        # f32[N,2]
    prev_pos: jax.Array,   # f32[N,2] previous movement-tick position
    alpha: jax.Array,      # f32[] interpolation fraction within the tick
    height: jax.Array,     # f32[N]
    facing: jax.Array,     # f32[N]
    radius: jax.Array,     # f32[N]
    alive: jax.Array,      # bool[N]
    flags: jax.Array,      # u32[N]
    hp: jax.Array,
    max_hp: jax.Array,
    planes: jax.Array,     # f32[6,4] frustum planes (nx,ny,nz,d)
    cam_pos: jax.Array,    # f32[3]
    lod_dists: jax.Array,  # f32[2] LOD switch distances
):
    """Frustum-cull (sphere test, the cheap half of the reference's
    frustum/OBB test, ref: game.c:2193-2219) and emit draw inputs.
    Positions interpolate between movement ticks at render rate
    (ref: interpolate_tick, movement.c:4085) and a LOD index is selected
    by camera distance (ref: game.c:439-463)."""
    pos = prev_pos + (pos - prev_pos) * alpha
    p3 = jnp.stack([pos[:, 0], height, pos[:, 1]], axis=1)   # [N,3]
    vis = alive & ((flags & jnp.uint32(EntityFlags.INVISIBLE)) == 0)
    dists = p3 @ planes[:, :3].T + planes[None, :, 3]        # [N,6]
    inside = jnp.all(dists >= -radius[:, None], axis=1)
    visible = vis & inside
    cam_d = jnp.linalg.norm(p3 - cam_pos[None, :], axis=1)
    lod = (cam_d > lod_dists[0]).astype(jnp.int32) + (
        cam_d > lod_dists[1]).astype(jnp.int32)

    # model matrices: translate * rotY(facing)
    c, s = jnp.cos(facing), jnp.sin(facing)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    m = jnp.stack([
        jnp.stack([c, zeros, s, p3[:, 0]], -1),
        jnp.stack([zeros, ones, zeros, p3[:, 1]], -1),
        jnp.stack([-s, zeros, c, p3[:, 2]], -1),
        jnp.stack([zeros, zeros, zeros, ones], -1),
    ], axis=1)                                               # [N,4,4]

    health_frac = jnp.where(max_hp > 0, hp / jnp.maximum(max_hp, 1e-6), 0.0)
    return visible, m, health_frac, lod


def draw_buffers(engine, camera, alpha: float = 1.0) -> dict:
    """One-call presentation export for the host renderer. `alpha` is the
    render-frame fraction within the current movement tick."""
    e = engine.state.ents
    planes = jnp.asarray(camera.frustum_planes())
    try:
        d1 = engine.settings.get("pf.video.lod_dist1")
        d2 = engine.settings.get("pf.video.lod_dist2")
    except Exception:
        d1, d2 = 200.0, 400.0
    visible, mats, health, lod = cull_and_emit(
        e.pos, e.prev_pos, jnp.float32(alpha), e.height, e.facing,
        e.sel_radius, e.alive, e.flags, e.hp, e.max_hp, planes,
        jnp.asarray(camera.pos, jnp.float32),
        jnp.asarray([d1, d2], jnp.float32))
    out = {
        "visible": visible,
        "model_mats": mats,
        "health_frac": health,
        "lod": lod,
        "faction": e.faction,
        "selection": list(engine.selection.selection),
    }
    # billboard sprites (ref: src/sprite.c, src/render/gl_sprite.c): host
    # list — scripts spawn few of them; exported as-is for the renderer
    try:
        from permafrost_engine_tpu.script import pf
        out["sprites"] = list(pf._sprites)
    except Exception:
        out["sprites"] = []
    return out


# faction dot colors for the minimap
_FACTION_COLORS = np.array([
    [60, 120, 255], [255, 60, 60], [60, 220, 60], [255, 220, 60],
    [200, 60, 255], [60, 220, 220], [255, 140, 0], [150, 150, 150],
] * 2, np.uint8)


def minimap_raster(engine, size: int = 256, faction_pov: int | None = None) -> np.ndarray:
    """Baked-terrain + live-unit-dots minimap (ref: src/render/gl_minimap.c,
    src/map/minimap.c) as a u8[size, size, 3] image, optionally fogged from
    one faction's point of view."""
    cfg: EngineConfig = engine.cfg
    heights = engine.heights

    def _resample(src: np.ndarray) -> np.ndarray:
        # exact nearest-neighbour index map: strided slicing only works
        # when the source resolution divides `size` (a 64-tile fog plane
        # vs an 85-px scripted minimap crashed the HUD compositor)
        ri = np.minimum(np.arange(size) * src.shape[0] // size,
                        src.shape[0] - 1)
        ci = np.minimum(np.arange(size) * src.shape[1] // size,
                        src.shape[1] - 1)
        return src[ri[:, None], ci[None, :]]

    hg = _resample(np.asarray(heights))
    img = np.zeros((size, size, 3), np.uint8)
    water = hg < 0
    img[water] = (40, 60, 140)
    land_shade = np.clip(90 + hg * 4, 60, 200).astype(np.uint8)
    img[~water] = np.stack([land_shade[~water] // 2,
                            land_shade[~water],
                            land_shade[~water] // 3], -1)

    if faction_pov is not None:
        fog = np.asarray(engine.state.fog.state)[faction_pov]
        fr = _resample(fog)
        img[fr == int(FogState.UNEXPLORED)] = 0
        img[fr == int(FogState.IN_FOG)] //= 2

    e = engine.state.ents
    alive = np.asarray(e.alive)
    pos = np.asarray(e.pos)[alive]
    fac = np.asarray(e.faction)[alive]
    ys = np.clip((pos[:, 1] / cfg.world_h * img.shape[0]).astype(int),
                 0, img.shape[0] - 1)
    xs = np.clip((pos[:, 0] / cfg.world_w * img.shape[1]).astype(int),
                 0, img.shape[1] - 1)
    img[ys, xs] = _FACTION_COLORS[np.clip(fac, 0, len(_FACTION_COLORS) - 1)]
    return img
