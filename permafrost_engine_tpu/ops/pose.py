"""Skeletal pose-palette computation as batched matmuls.

The reference computes per-entity joint pose matrices on CPU each tick
(ref: src/anim/anim.c A_Update) and packs every entity's palette into one
shared texture for GPU skinning (ref: src/anim/anim_texture.c:93-145).
On TPU both halves are one batched computation over [N, J, 4, 4] arrays:

  * local joint transforms come from keyframe interpolation (lerp + slerp
    on device)
  * globals = parent-chain products, computed level-by-level over the
    skeleton hierarchy (depth <= ~10 for humanoid rigs, so a handful of
    batched [N*J, 4, 4] matmuls on the MXU)
  * the skinning palette = global @ inverse_bind — one more batched matmul

The palette array IS the reference's anim texture: downstream consumers
(render/draw emission) read it directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_JOINTS = 96  # ref: src/entity.h:50


def trs_to_mat(trans: jax.Array, rot_quat: jax.Array, scale: jax.Array) -> jax.Array:
    """Compose TRS -> 4x4 matrices, batched over leading dims.

    trans [..., 3], rot_quat [..., 4] (x, y, z, w), scale [..., 3].
    """
    x, y, z, w = (rot_quat[..., 0], rot_quat[..., 1],
                  rot_quat[..., 2], rot_quat[..., 3])
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z

    r = jnp.stack([
        jnp.stack([1 - (yy + zz), xy - wz, xz + wy], -1),
        jnp.stack([xy + wz, 1 - (xx + zz), yz - wx], -1),
        jnp.stack([xz - wy, yz + wx, 1 - (xx + yy)], -1),
    ], -2)                                              # [..., 3, 3]
    r = r * scale[..., None, :]
    m = jnp.zeros((*r.shape[:-2], 4, 4), r.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(trans)
    m = m.at[..., 3, 3].set(1.0)
    return m


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Batched slerp; t broadcastable over leading dims."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    # fall back to lerp when nearly parallel
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    w0 = jnp.where(sin_t > 1e-5, jnp.sin((1 - t) * theta) / sin_t, 1 - t)
    w1 = jnp.where(sin_t > 1e-5, jnp.sin(t * theta) / sin_t, t)
    out = w0 * q0 + w1 * q1
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def hierarchy_levels(parents: np.ndarray) -> list[np.ndarray]:
    """Group joint indices by depth; parents[j] < j or -1 for roots."""
    depth = np.zeros(len(parents), np.int32)
    for j, p in enumerate(parents):
        depth[j] = 0 if p < 0 else depth[p] + 1
    return [np.nonzero(depth == d)[0] for d in range(depth.max() + 1)]


def pose_palette(
    local: jax.Array,        # f32[N, J, 4, 4] local joint transforms
    inv_bind: jax.Array,     # f32[J, 4, 4] or [N, J, 4, 4]
    parents,                 # i32[J] / sequence (-1 roots); STATIC values
    levels: tuple,           # tuple of tuples of joint ids by depth (static)
) -> jax.Array:
    """Global pose palette [N, J, 4, 4]: parent-chain products then
    inverse-bind multiply — the anim-texture contents.

    `parents` must be concrete (numpy / tuple / non-traced array): the
    hierarchy is compile-time structure. Inside a jit, pass a static
    tuple (SkinBank stores one)."""
    par = tuple(int(p) for p in np.asarray(parents))
    return _pose_palette(local, inv_bind, par, levels)


def _affine_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched affine 4x4 product a @ b (bottom rows assumed [0,0,0,1]).

    Written as broadcast-multiply-sum over the 3x4 affine block:
    `jnp.matmul` on [..., 4, 4] lowers to a tiny-contraction dot_general
    that the TPU pads catastrophically (a batched 4x4 chain measured
    ~3 ms per level at 10k x 32 joints); this form stays elementwise on
    the VPU."""
    ra, ta = a[..., :3, :3], a[..., :3, 3]
    rb = b[..., :3, :4]
    top = jnp.sum(ra[..., :, :, None] * rb[..., None, :, :], axis=-2)
    top = top.at[..., :, 3].add(ta)
    bot = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], a.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bot], axis=-2)


@functools.partial(jax.jit, static_argnames=("parents", "levels"))
def _pose_palette(local, inv_bind, parents, levels):
    # Per-level pieces + ONE final concat/permutation. The previous form
    # (`glob.at[:, ids].set(prod)` per level) rewrote the full [N, J, 4, 4]
    # array once per hierarchy level (~10 x 21 MB at 10k x 32 joints);
    # level d's parents all sit at level d-1, so only the previous level's
    # small piece is ever read.
    j = local.shape[1]
    lv0 = np.asarray(levels[0], np.int64)
    pieces = [local[:, lv0]]
    pos = np.full(j, -1, np.int64)          # joint -> index within its level
    pos[lv0] = np.arange(len(lv0))
    for d in range(1, len(levels)):
        ids = np.asarray(levels[d], np.int64)
        ppos = pos[np.asarray([parents[i] for i in ids])]
        pieces.append(_affine_mul(pieces[d - 1][:, ppos], local[:, ids]))
        pos[ids] = np.arange(len(ids))
    glob = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    order = np.concatenate([np.asarray(l, np.int64) for l in levels])
    glob = glob[:, np.argsort(order)]       # back to joint order (static)
    if inv_bind.ndim == 3:
        inv_bind = inv_bind[None]
    ib = jnp.broadcast_to(inv_bind, glob.shape)
    return _affine_mul(glob, ib)


@jax.jit
def sample_clip(
    keyframes_t: jax.Array,   # f32[F] keyframe times
    trans: jax.Array,         # f32[F, J, 3]
    rots: jax.Array,          # f32[F, J, 4]
    scales: jax.Array,        # f32[F, J, 3]
    t: jax.Array,             # f32[N] sample times (wrapped by caller)
) -> jax.Array:
    """Interpolate a clip at N times -> local matrices [N, J, 4, 4]."""
    f = keyframes_t.shape[0]
    i1 = jnp.clip(jnp.searchsorted(keyframes_t, t, side="right"), 1, f - 1)
    i0 = i1 - 1
    t0, t1 = keyframes_t[i0], keyframes_t[i1]
    w = ((t - t0) / jnp.maximum(t1 - t0, 1e-6))[:, None, None]  # [N,1,1]
    tr = trans[i0] * (1 - w) + trans[i1] * w
    sc = scales[i0] * (1 - w) + scales[i1] * w
    q = quat_slerp(rots[i0], rots[i1], w)                       # [N,J,4]
    return trs_to_mat(tr, q, sc)
