"""Projectile physics: ballistic step, hit tests, device-side spawning.

Mirrors src/phys/projectile.c: 30 Hz batch update with ballistic
integration (projectile.c:178), hit tests against entities
(swept-sphere vs OBB at projectile.c:282-354 — approximated here as
sphere-vs-cylinder at the entity's selection radius), damage carried in
the projectile cookie and applied on hit (ref: src/game/combat.c:1020),
and an arc-solving launcher (P_Projectile_VelocityForTarget,
projectile.c:594).

Spawning happens *inside* the jitted step (ranged attackers allocate pool
slots via an argsort over the active mask), so volleys never round-trip to
the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    DiplomacyState,
    EngineConfig,
    EntityFlags,
    PROJECTILE_HZ,
)

GRAVITY = 98.0          # world units / s^2 (scaled to 8-unit tiles)
PROJ_SPEED = 120.0      # default launch speed, world units / s
LAUNCH_HEIGHT = 4.0
HIT_HEIGHT_TOL = 6.0
DT = 1.0 / PROJECTILE_HZ


def launch_velocity(src_xz, dst_xz, speed=PROJ_SPEED):
    """Arc velocity reaching dst at the same height: flat-ground solution of
    P_Projectile_VelocityForTarget (ref: projectile.c:594)."""
    d = dst_xz - src_xz
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = dist / speed
    vxz = d / jnp.maximum(t, 1e-6)
    vy = 0.5 * GRAVITY * t[..., 0]
    return vxz, vy, t[..., 0]


def spawn_projectiles(
    cfg: EngineConfig,
    proj,                  # ProjectileArena
    shooter_mask: jax.Array,   # bool[N] ranged attackers firing this tick
    pos: jax.Array,            # f32[N,2] shooter positions
    target_pos: jax.Array,     # f32[N,2] target positions
    faction: jax.Array,        # i32[N]
    damage: jax.Array,         # f32[N] cookie payload
):
    """Allocate pool slots for shooters and write their projectiles."""
    n = shooter_mask.shape[0]
    p = cfg.max_projectiles
    # free slots first (False sorts before True)
    free_order = jnp.argsort(proj.active)
    num_free = jnp.sum(~proj.active)
    rank = jnp.cumsum(shooter_mask) - 1                  # rank among shooters
    can = shooter_mask & (rank < num_free) & (rank < p)
    slot = free_order[jnp.clip(rank, 0, p - 1)]
    slot = jnp.where(can, slot, p)                       # drop on overflow

    vxz, vy, _ = launch_velocity(pos, target_pos)
    vel3 = jnp.concatenate([vxz[:, :1], vy[:, None], vxz[:, 1:]], axis=1)
    pos3 = jnp.stack([pos[:, 0], jnp.full((n,), LAUNCH_HEIGHT), pos[:, 1]], 1)

    return proj.replace(
        active=proj.active.at[slot].set(True, mode="drop"),
        pos=proj.pos.at[slot].set(pos3, mode="drop"),
        vel=proj.vel.at[slot].set(vel3, mode="drop"),
        faction=proj.faction.at[slot].set(faction, mode="drop"),
        parent=proj.parent.at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"),
        cookie=proj.cookie.at[slot].set(damage, mode="drop"),
    )


def projectile_substep(cfg: EngineConfig, state, deltas):
    """One 30 Hz physics tick: integrate, test hits, apply damage."""
    proj = state.projectiles
    ents = state.ents
    p = cfg.max_projectiles
    n = cfg.max_ents

    new_pos = proj.pos + proj.vel * DT
    new_vel = proj.vel.at[:, 1].add(-GRAVITY * DT)

    # ---- hit test: nearest enemy entity within its selection radius ---------
    old_xz = jnp.stack([proj.pos[:, 0], proj.pos[:, 2]], 1)
    targetable = ents.alive & (ents.hp > 0.0) & (
        (ents.flags & jnp.uint32(EntityFlags.COMBATABLE)) != 0)
    war = state.factions.diplomacy == DiplomacyState.WAR
    # pack war rows into u32 bitmasks: per-pair test is an elementwise
    # shift, not a [P, block] general gather (see ops/grid.nearest_match)
    f = war.shape[0]
    war_bits = jnp.sum(
        war.astype(jnp.uint32) << jnp.arange(f, dtype=jnp.uint32)[None, :],
        axis=1)
    ent_bits = war_bits[jnp.clip(ents.faction, 0, f - 1)]
    proj_shift = jnp.clip(proj.faction, 0, f - 1).astype(jnp.uint32)
    pxz = jnp.stack([new_pos[:, 0], new_pos[:, 2]], 1)

    block = min(1024, n)
    num_blocks = -(-n // block)

    def body(carry, blk_idx):
        best_d2, best_i = carry
        s = blk_idx * block
        bpos = jax.lax.dynamic_slice_in_dim(ents.pos, s, block)
        brad = jax.lax.dynamic_slice_in_dim(ents.sel_radius, s, block)
        bmask = jax.lax.dynamic_slice_in_dim(targetable, s, block)
        bbits = jax.lax.dynamic_slice_in_dim(ent_bits, s, block)
        bh = jax.lax.dynamic_slice_in_dim(ents.height, s, block)
        # swept test: closest approach of the tick's travel segment to the
        # entity's hit cylinder (ref: phys_sweep_test, projectile.c:282)
        seg = (pxz - old_xz)[:, None, :]                   # [P,1,2]
        rel = bpos[None, :, :] - old_xz[:, None, :]        # [P,B,2]
        seg_len2 = jnp.sum(seg * seg, axis=-1)
        t = jnp.clip(jnp.sum(rel * seg, axis=-1)
                     / jnp.maximum(seg_len2, 1e-9), 0.0, 1.0)
        closest = old_xz[:, None, :] + seg * t[..., None]
        d2 = jnp.sum((closest - bpos[None, :, :]) ** 2, axis=-1)
        hit_r = brad[None, :] + 0.5
        ok = (
            bmask[None, :]
            & (((bbits[None, :] >> proj_shift[:, None]) & 1) == 1)
            & (d2 <= hit_r * hit_r)
            & (jnp.abs(new_pos[:, 1:2] - bh[None, :]) < HIT_HEIGHT_TOL)
        )
        d2 = jnp.where(ok, d2, jnp.inf)
        bd2 = jnp.min(d2, axis=1)
        bi = s + jnp.argmin(d2, axis=1).astype(jnp.int32)
        better = bd2 < best_d2
        return (jnp.where(better, bd2, best_d2),
                jnp.where(better, bi, best_i)), None

    init = (jnp.full(p, jnp.inf), jnp.full(p, -1, jnp.int32))
    (hit_d2, hit_i), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))
    hit = proj.active & (hit_i >= 0) & jnp.isfinite(hit_d2)

    # ---- ground impact --------------------------------------------------------
    grounded = proj.active & (new_pos[:, 1] <= 0.0) & ~hit

    # ---- damage (cookie * (1 - armour), ref: combat.c:1020) -------------------
    ti = jnp.clip(hit_i, 0, n - 1)
    dmg = jnp.where(hit, proj.cookie * (1.0 - ents.armour_pc[ti]), 0.0)
    dmg_in = jnp.zeros(n, jnp.float32).at[
        jnp.where(hit, ti, n)].add(dmg, mode="drop")
    new_hp = jnp.where(ents.alive, ents.hp - dmg_in, ents.hp)

    new_proj = proj.replace(
        active=proj.active & ~hit & ~grounded,
        pos=new_pos,
        vel=new_vel,
    )
    new_ents = ents.replace(hp=new_hp)
    deltas = deltas.replace(
        proj_hit=jnp.where(hit, hit_i, deltas.proj_hit),
        proj_hit_shooter=jnp.where(hit, proj.parent, deltas.proj_hit_shooter),
        proj_hit_cookie=jnp.where(hit, proj.cookie, deltas.proj_hit_cookie))
    return state.replace(projectiles=new_proj, ents=new_ents), deltas
