"""Collision / intersection library: frustum, OBB, AABB, ray tests.

Mirrors the reference's C_* collision library (ref: src/phys/collision.c:
frustum/OBB/AABB/ray tests, used by culling at game.c:2201 and picking).
Everything is batched jnp over arrays of shapes so a single call tests the
whole arena — the reference's per-entity loop becomes one VPU pass.

OBBs here are y-axis-aligned boxes (yaw rotation only), matching how the
engine derives entity OBBs from bind-pose AABBs + yaw facing
(ref: Entity_CurrentOBB, src/entity.c:336).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


def obb_corners(center, half_ext, yaw):
    """8 corners of yaw-rotated boxes. center [...,3], half_ext [...,3],
    yaw [...] -> [..., 8, 3]."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32)                                   # [8,3]
    local = signs * half_ext[..., None, :]             # [...,8,3]
    x = local[..., 0] * c[..., None] + local[..., 2] * s[..., None]
    z = -local[..., 0] * s[..., None] + local[..., 2] * c[..., None]
    rot = jnp.stack([x, local[..., 1], z], axis=-1)
    return center[..., None, :] + rot


def frustum_obb_test(planes, center, half_ext, yaw):
    """Conservative frustum-vs-OBB: keep if no plane has all 8 corners
    outside (the reference's fast frustum-OBB used in culling).
    planes f32[6,4]; box args batched [...]. Returns bool[...]."""
    corners = obb_corners(center, half_ext, yaw)       # [...,8,3]
    d = jnp.einsum("...kc,pc->...kp", corners, planes[:, :3]) + planes[:, 3]
    all_out = jnp.any(jnp.all(d < 0, axis=-2), axis=-1)
    return ~all_out


def ray_aabb(origin, direction, box_min, box_max):
    """Slab test. origin/direction [3]; boxes [...,3].
    Returns (hit bool[...], t f32[...])."""
    inv = 1.0 / jnp.where(jnp.abs(direction) < _EPS,
                          jnp.where(direction >= 0, _EPS, -_EPS), direction)
    t1 = (box_min - origin) * inv
    t2 = (box_max - origin) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    return hit, jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


def ray_obb(origin, direction, center, half_ext, yaw):
    """Transform the ray into each box's local frame, then slab-test."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rel = origin - center                              # [...,3]
    lx = rel[..., 0] * c - rel[..., 2] * s
    lz = rel[..., 0] * s + rel[..., 2] * c
    lo = jnp.stack([lx, rel[..., 1], lz], -1)
    dx = direction[0] * c - direction[2] * s
    dz = direction[0] * s + direction[2] * c
    ld = jnp.stack([dx, jnp.broadcast_to(direction[1], dx.shape), dz], -1)

    inv = 1.0 / jnp.where(jnp.abs(ld) < _EPS,
                          jnp.where(ld >= 0, _EPS, -_EPS), ld)
    t1 = (-half_ext - lo) * inv
    t2 = (half_ext - lo) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = tmax >= jnp.maximum(tmin, 0.0)
    return hit, jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


def aabb_aabb_test(min_a, max_a, min_b, max_b):
    """Overlap test, batched over leading dims of either side."""
    return jnp.all((min_a <= max_b) & (max_a >= min_b), axis=-1)


def sphere_obb_test(sphere_c, sphere_r, center, half_ext, yaw):
    """Clamp the sphere centre into the box's local frame."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rel = sphere_c - center
    lx = rel[..., 0] * c - rel[..., 2] * s
    lz = rel[..., 0] * s + rel[..., 2] * c
    lo = jnp.stack([lx, rel[..., 1], lz], -1)
    nearest = jnp.clip(lo, -half_ext, half_ext)
    d2 = jnp.sum((lo - nearest) ** 2, axis=-1)
    return d2 <= sphere_r * sphere_r


def swept_sphere_obb(p0, p1, radius, center, half_ext, yaw, steps: int = 4):
    """Swept-sphere vs OBB via conservative sub-stepping — the projectile
    hit test (ref: phys_sweep_test, projectile.c:282-354). p0/p1 [...,3]."""
    ts = jnp.linspace(0.0, 1.0, steps)
    hits = []
    for i in range(steps):
        pc = p0 + (p1 - p0) * ts[i]
        hits.append(sphere_obb_test(pc, radius, center, half_ext, yaw))
    return jnp.any(jnp.stack(hits), axis=0)
