"""Height-aware shadowcasting visibility.

The reference walks recursive shadowcast octants per viewer on uneven
terrain (ref: /root/reference/src/game/fog_of_war.c:427-541 cast_light).
Recursion doesn't vectorize, so the TPU formulation is a *ring-ordered
dynamic program* over a fixed window around every viewer at once:

  for each window offset t (grouped by Chebyshev ring k = 1..R):
      maxslope[t] = max(maxslope[parent(t)], slope(parent(t)))
      visible[t]  = slope(t) >= maxslope[t]

where parent(t) is the neighbour one ring closer along the ray to the
viewer and slope(x) = (terrain_height(x) - eye_height) / distance(x).
Every ring step is a static-index gather + elementwise max over the whole
[N_viewers, window] tensor — K sequential steps total, no per-viewer
control flow. The parent chain approximates the reference's per-octant
Bresenham shadows; an oracle test bounds the disagreement.

Cost note: the per-viewer window gather + per-faction scatter are element
ops (~1/cycle on TPU), so this path scales as N_viewers x window^2 —
~11 M elements at 10k viewers / radius 16. It runs only on maps with
height variation, which in practice carry far fewer units; flat maps use
the dilation-cascade path in ops/fog.py. If a height-map battle at 10k+
units becomes a target, bucket viewers per tile first (dedupe identical
(tile, radius) viewers) before widening this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

EYE_HEIGHT = 2.0     # viewer eye above its tile, world units
SEE_TOL = 0.5        # target tiles count as slightly raised (see ridgetops)


@functools.cache
def _window_tables(radius: int):
    """Static DP tables for a (2R+1)^2 window. Each offset's horizon comes
    from the TWO ring-(k-1) tiles straddling the exact ray to the viewer,
    blended by where the ray crosses between them (the standard dual-parent
    horizon DP; a single DDA parent disagreed with an exact ray oracle on
    ~12% of rough-terrain tiles, dual parents cut that to a few percent).
    Returns (offsets i32[W2,2], pa i32[W2], pb i32[W2], wb f32[W2],
    rings: tuple of index arrays, dist f32[W2])."""
    r = radius
    offs = [(dr, dc) for dr in range(-r, r + 1) for dc in range(-r, r + 1)]
    idx_of = {o: i for i, o in enumerate(offs)}
    w2 = len(offs)
    pa = np.zeros(w2, np.int64)
    pb = np.zeros(w2, np.int64)
    wb = np.zeros(w2, np.float32)
    rings: dict[int, list[int]] = {}
    for i, (dr, dc) in enumerate(offs):
        k = max(abs(dr), abs(dc))
        rings.setdefault(k, []).append(i)
        if k == 0:
            pa[i] = pb[i] = i
            continue
        if abs(dr) >= abs(dc):
            # row-dominant: the ray crosses row dr - sign(dr) at column
            # dc * (k-1)/k, between two ring-(k-1) tiles
            pr = dr - int(np.sign(dr))
            cx = dc * (abs(dr) - 1) / abs(dr)
            lo, hi = int(np.floor(cx)), int(np.ceil(cx))
            pa[i] = idx_of[(pr, lo)]
            pb[i] = idx_of[(pr, hi)]
            wb[i] = cx - lo
        else:
            pc = dc - int(np.sign(dc))
            rx = dr * (abs(dc) - 1) / abs(dc)
            lo, hi = int(np.floor(rx)), int(np.ceil(rx))
            pa[i] = idx_of[(lo, pc)]
            pb[i] = idx_of[(hi, pc)]
            wb[i] = rx - lo
    dist = np.array([max(np.hypot(dr, dc), 1e-6) for dr, dc in offs],
                    np.float32)
    ring_list = tuple(np.asarray(rings[k], np.int64)
                      for k in sorted(rings) if k > 0)
    return (np.asarray(offs, np.int64), pa, pb, wb, ring_list, dist)


@functools.cache
def _ray_weight_table(radius: int) -> np.ndarray:
    """Exact-mode table W f32[W2, W2]: W[t, w] = 1 / min distance at which
    the dense ray march to target offset t samples window tile w (0 = the
    ray never samples w). Sampling matches the reference's per-octant
    cast_light discretization as modelled by the ray oracle: 4 samples per
    unit distance, nearest-tile rounding (fog_of_war.c:427-541).

    A blocker's max slope over its samples on ray t is then
    (h[w] - eye) * W[t, w] — the whole exact occlusion test becomes one
    masked max-reduction with NO gathers."""
    r = radius
    offs = [(dr, dc) for dr in range(-r, r + 1) for dc in range(-r, r + 1)]
    idx_of = {o: i for i, o in enumerate(offs)}
    w2 = len(offs)
    w_tab = np.zeros((w2, w2), np.float32)
    for i, (dr, dc) in enumerate(offs):
        d = float(np.hypot(dr, dc))
        if d == 0:
            continue
        steps = int(np.ceil(d)) * 4
        ts = np.linspace(0, 1, steps, endpoint=False)[1:]
        for t in ts:
            sr = int(np.round(dr * t))
            sc = int(np.round(dc * t))
            j = idx_of[(sr, sc)]
            if j == idx_of[(0, 0)]:
                continue       # the viewer's own tile never occludes
            ds = max(float(np.hypot(dr * t, dc * t)), 1e-6)
            w_tab[i, j] = max(w_tab[i, j], 1.0 / ds)
    return w_tab


@functools.partial(jax.jit,
                   static_argnames=("radius", "tiles_h", "tiles_w",
                                    "max_factions", "exact"))
def shadowcast_visibility(
    pos_rc: jax.Array,        # i32[N,2] viewer tile (row, col)
    viewer_ok: jax.Array,     # bool[N] alive + vision > 0
    faction: jax.Array,       # i32[N]
    vision_tiles: jax.Array,  # f32[N] vision radius in tiles
    tile_height: jax.Array,   # f32[TH, TW]
    *,
    radius: int,
    tiles_h: int,
    tiles_w: int,
    max_factions: int,
    exact: bool = False,
) -> jax.Array:
    """Per-faction visible mask with terrain occlusion. bool[F, TH, TW].

    exact=False (default): ring-ordered dual-parent horizon DP — K
    sequential window steps, scales to thousands of viewers; crest
    boundary tiles can disagree with an exact ray march by one tile.
    exact=True: the dense ray-march occlusion itself as one masked
    [N, W2, W2] max-reduction (zero gathers) — bit-exact vs the ray
    oracle, O(window^4) per viewer, for modest viewer counts /
    verification (enable engine-wide with PFTPU_EXACT_FOG=1)."""
    offs_np, pa_np, pb_np, wb_np, rings, dist_np = _window_tables(radius)
    offs = jnp.asarray(offs_np)           # [W2, 2]
    pa_t = jnp.asarray(pa_np)             # [W2]
    pb_t = jnp.asarray(pb_np)
    wb_t = jnp.asarray(wb_np)
    dist = jnp.asarray(dist_np)           # [W2]
    n, w2 = pos_rc.shape[0], offs_np.shape[0]

    rr = pos_rc[:, 0:1] + offs[None, :, 0]          # [N, W2]
    cc = pos_rc[:, 1:2] + offs[None, :, 1]
    in_bounds = (rr >= 0) & (rr < tiles_h) & (cc >= 0) & (cc < tiles_w)
    # height window via ROW gathers + in-row one-hot matmul, not
    # tile_height[rr, cc]: a [N, W2] element gather is ~N*W2 serial
    # element fetches on TPU (measured 21 ms of the fog frame's 41 ms at
    # 2.6k viewers; same lesson as ops/velocity._slab_fetch). Row fetches
    # move whole contiguous [TW] rows, and the clipped-column one-hot
    # contraction is exact (products with 1.0/0.0) at HIGHEST precision.
    wspan = 2 * radius + 1
    span = jnp.arange(wspan)
    abs_r_raw = pos_rc[:, 0:1] - radius + span[None, :]        # [N, S]
    abs_r = jnp.clip(abs_r_raw, 0, tiles_h - 1)
    abs_c = jnp.clip(pos_rc[:, 1:2] - radius + span[None, :], 0,
                     tiles_w - 1)                              # [N, S]
    rows = tile_height[abs_r]                                  # [N, S, TW]
    col_onehot = (jnp.arange(tiles_w)[None, :, None]
                  == abs_c[:, None, :]).astype(tile_height.dtype)
    h = jnp.einsum("nrw,nwc->nrc", rows, col_onehot,
                   precision=jax.lax.Precision.HIGHEST
                   ).reshape(n, w2)                            # [N, W2]
    eye = (tile_height[pos_rc[:, 0], pos_rc[:, 1]] + EYE_HEIGHT)[:, None]
    # only terrain HIGHER than the viewer occludes (the reference's height-
    # level rule: looking down a cliff sees the floor below; a ridge above
    # the viewer casts a shadow behind it — fog_of_war.c:427-541 gates
    # cast_light on height levels above the viewer's)
    block_slope = jnp.where(h > eye + 0.01, (h - eye) / dist[None, :], -1e9)
    see_slope = (h + SEE_TOL - eye) / dist[None, :]

    # the viewer's own tile never occludes (ring-1 parents are the center)
    center = w2 // 2
    block = block_slope.at[:, center].set(-1e9)

    if exact:
        # masked max-reduction over the static ray-sample weight table:
        # maxslope[n, t] = max_w (h[n, w] - eye[n]) * W[t, w] over sampled
        # blockers — the ray oracle, vectorized without a single gather
        w_tab = jnp.asarray(_ray_weight_table(radius))       # [W2_t, W2_w]
        rise = jnp.where((h > eye + 0.01) & in_bounds, h - eye, jnp.nan)
        slopes = rise[:, None, :] * w_tab[None, :, :]        # [N, T, W]
        slopes = jnp.where(jnp.isnan(slopes) | (w_tab[None] == 0.0),
                           -1e9, slopes)
        maxslope = jnp.max(slopes, axis=-1)                  # [N, T]
        visible = (
            viewer_ok[:, None]
            & in_bounds
            & (dist[None, :] <= vision_tiles[:, None])
            & (maxslope <= see_slope + 1e-9)
        )
        flat = jnp.where(
            visible,
            jnp.clip(faction, 0, max_factions - 1)[:, None]
            * (tiles_h * tiles_w) + rr * tiles_w + cc,
            max_factions * tiles_h * tiles_w)
        out = jnp.zeros((max_factions * tiles_h * tiles_w,), jnp.int32)
        out = out.at[flat.reshape(-1)].add(1, mode="drop")
        return (out.reshape(max_factions, tiles_h, tiles_w) > 0)

    horizon = jnp.full((n, w2), -1e9, jnp.float32)
    for ring_idx in rings:
        ri = jnp.asarray(ring_idx)
        pa, pb, w = pa_t[ri], pb_t[ri], wb_t[ri][None, :]
        va = jnp.maximum(horizon[:, pa], block[:, pa])
        vb = jnp.maximum(horizon[:, pb], block[:, pb])
        # take the parent the exact ray passes nearest (lerping would mix
        # the "no shadow" sentinel into real horizons and erase them);
        # dead ties (ray exactly between parents) shadow conservatively
        near = jnp.where(w < 0.5, va, vb)
        tie = jnp.abs(w - 0.5) < 1e-6
        horizon = horizon.at[:, ri].set(
            jnp.where(tie, jnp.maximum(va, vb), near))
    maxslope = horizon

    visible = (
        viewer_ok[:, None]
        & in_bounds
        & (dist[None, :] <= vision_tiles[:, None])
        & (see_slope >= maxslope - 1e-6)
    )

    # per-faction OR via in-row one-hot shift + ROW-wise scatter-add, not
    # a [N*W2] element scatter (measured 25 ms of the fog frame's 41 ms):
    # each window row shifts to its absolute columns with the same one-hot
    # the gather used, then N*S whole rows accumulate into the
    # (faction, row)-indexed plane. Sums stay < 2^24 so f32 adds are
    # exact; out-of-bounds cells are already False in `visible`, and
    # fully out-of-bounds rows go to a sentinel row.
    vis33 = visible.reshape(n, wspan, wspan).astype(jnp.float32)
    shifted = jnp.einsum("nrc,nwc->nrw", vis33,
                         col_onehot.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)  # [N, S, TW]
    fac_c = jnp.clip(faction, 0, max_factions - 1)
    row_idx = jnp.where(
        (abs_r_raw >= 0) & (abs_r_raw < tiles_h),
        fac_c[:, None] * tiles_h + abs_r_raw,
        max_factions * tiles_h)                                # [N, S]
    out2d = jnp.zeros((max_factions * tiles_h + 1, tiles_w), jnp.float32)
    out2d = out2d.at[row_idx.reshape(-1)].add(
        shifted.reshape(-1, tiles_w), mode="drop")
    return (out2d[:max_factions * tiles_h]
            .reshape(max_factions, tiles_h, tiles_w) > 0.5)
