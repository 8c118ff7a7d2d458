"""ClearPath / HRVO collision avoidance as a dense candidate-velocity solve.

The reference builds hybrid reciprocal velocity-obstacle cones per
neighbour, computes candidate velocities (the desired velocity, its
projections onto cone edges, and edge intersections), tests each candidate
against every cone, and picks the feasible candidate nearest the desired
velocity (ref: src/game/clearpath.c:130-388). That structure is already a
dense [candidates x cones] computation — exactly what the VPU wants — so
the TPU version evaluates the whole arena at once as
[N, C candidates, K cones] tensor ops with no per-entity control flow.

Velocities are per-movement-tick displacements, like the reference's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-6
_BIG = 1e9


def _norm(v, axis=-1, keepdims=True):
    return jnp.linalg.norm(v, axis=axis, keepdims=keepdims)


def _unit(v):
    return v / jnp.maximum(_norm(v), _EPS)


@functools.partial(jax.jit, static_argnames=())
def new_velocities(
    pos: jax.Array,        # f32[N,2]
    vel: jax.Array,        # f32[N,2]
    radius: jax.Array,     # f32[N]
    vpref: jax.Array,      # f32[N,2] preferred velocity (boids output)
    max_speed_tick: jax.Array,  # f32[N]
    neigh_idx: jax.Array,  # i32[N,K] neighbour slots (-1 invalid)
    neigh_valid: jax.Array,  # bool[N,K]
    neigh_static: jax.Array,  # bool[N,K] neighbour is a non-moving obstacle
    active: jax.Array,     # bool[N] entities that should avoid (moving)
    neigh_pos: jax.Array | None = None,  # f32[N,K,2] from the grid payload
    neigh_vel: jax.Array | None = None,  # f32[N,K,2] (avoids arena gathers:
    neigh_rad: jax.Array | None = None,  # f32[N,K]   TPU element gathers run
                                         # ~1 elem/cycle)
) -> jax.Array:
    """Feasible velocity nearest vpref per entity (G_ClearPath_NewVelocity,
    ref: src/game/clearpath.c:694).

    Returns f32[N,2] new velocities; inactive entities return vpref.
    """
    n, k = neigh_idx.shape
    ni = jnp.clip(neigh_idx, 0, n - 1)
    npos = pos[ni] if neigh_pos is None else neigh_pos  # [N,K,2]
    nvel = vel[ni] if neigh_vel is None else neigh_vel
    nvel = jnp.where(neigh_static[..., None], 0.0, nvel)
    nrad = radius[ni] if neigh_rad is None else neigh_rad

    rel = npos - pos[:, None, :]                    # [N,K,2]
    dist = jnp.linalg.norm(rel, axis=-1)            # [N,K]
    comb_r = (radius[:, None] + nrad) * 1.05        # small buffer
    colliding = neigh_valid & (dist < comb_r)

    p_hat = rel / jnp.maximum(dist, _EPS)[..., None]
    # cone half-angle: sin(theta) = R / |p| (clamped below 1 when apart)
    sin_t = jnp.clip(comb_r / jnp.maximum(dist, _EPS), 0.0, 1.0)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    # colliding neighbours become half-plane obstacles (cos 0 -> 90deg cone)
    cos_t = jnp.where(colliding, 0.0, cos_t)

    # HRVO apex: reciprocal (RVO) apex for mutual avoidance of moving
    # neighbours; plain VO apex (neighbour velocity) for static obstacles
    # (ref: clearpath.c:130-247 builds VO/RVO/HRVO variants).
    rvo_apex = (vel[:, None, :] + nvel) / 2.0
    vo_apex = nvel
    apex = jnp.where(neigh_static[..., None], vo_apex, rvo_apex)

    # cone edge directions: p_hat rotated by +/- theta
    rot_l = jnp.stack(
        [cos_t * p_hat[..., 0] - sin_t * p_hat[..., 1],
         sin_t * p_hat[..., 0] + cos_t * p_hat[..., 1]], axis=-1)
    rot_r = jnp.stack(
        [cos_t * p_hat[..., 0] + sin_t * p_hat[..., 1],
         -sin_t * p_hat[..., 0] + cos_t * p_hat[..., 1]], axis=-1)

    # ---- candidate set -----------------------------------------------------
    # vdes, scaled vdes, zero, and vdes projected on cone edges
    # (ref: clearpath.c:321-367 candidate construction). Projections use
    # only the nearest KP cones: neighbours arrive distance-sorted from the
    # knn, and far cones rarely bound the solution — the reference likewise
    # drops the farthest neighbours under pressure (clearpath.c:390).
    # Every candidate is still tested against ALL K cones below.
    kp = min(16, k)
    w = vpref[:, None, :] - apex[:, :kp]            # [N,KP,2]
    proj_l = apex[:, :kp] + rot_l[:, :kp] * jnp.maximum(
        jnp.sum(w * rot_l[:, :kp], axis=-1, keepdims=True), 0.0)
    proj_r = apex[:, :kp] + rot_r[:, :kp] * jnp.maximum(
        jnp.sum(w * rot_r[:, :kp], axis=-1, keepdims=True), 0.0)

    scales = jnp.array([1.0, 0.75, 0.5, 0.25, 0.0], jnp.float32)
    base = vpref[:, None, :] * scales[None, :, None]          # [N,5,2]
    # rotated-vdes fan: threads gaps between tangent cones (the reference
    # gets this from cone-edge intersection candidates, clearpath.c:321)
    angs = jnp.deg2rad(jnp.array(
        [15.0, -15.0, 30.0, -30.0, 45.0, -45.0, 70.0, -70.0, 90.0, -90.0]))
    ca, sa = jnp.cos(angs), jnp.sin(angs)                     # [A]
    vx, vz = vpref[:, 0:1], vpref[:, 1:2]                     # [N,1]
    rot = jnp.stack(
        [vx * ca[None, :] - vz * sa[None, :],
         vx * sa[None, :] + vz * ca[None, :]], axis=-1)       # [N,A,2]
    rot = jnp.concatenate([rot, rot * 0.5], axis=1)           # [N,2A,2]
    cand = jnp.concatenate([base, rot, proj_l, proj_r], axis=1)  # [N,5+2A+2K,2]

    # clamp candidate speeds
    cspeed = jnp.linalg.norm(cand, axis=-1)
    cscale = jnp.where(cspeed > max_speed_tick[:, None],
                       max_speed_tick[:, None] / jnp.maximum(cspeed, _EPS), 1.0)
    cand = cand * cscale[..., None]

    # ---- feasibility: candidate outside every cone --------------------------
    # The [N,C,K] tensors dominate movement bandwidth. Build them DIRECTLY
    # from [N,C] x [N,K] broadcast products — decomposing
    #   w.p_hat = cand.p_hat - apex.p_hat
    #   |w|^2   = |cand|^2 - 2 cand.apex + |apex|^2
    # skips the [N,C,K,2] difference tensor entirely, so the whole cone
    # test fuses into the per-[N,C] violation reductions (f32: the
    # cancellation in |w|^2 near the apex is below f32 noise, not bf16's).
    cx, cz = cand[..., 0], cand[..., 1]                       # [N,C]
    ax, az = apex[..., 0], apex[..., 1]                       # [N,K]
    px, pz = p_hat[..., 0], p_hat[..., 1]                     # [N,K]
    along = (cx[:, :, None] * px[:, None, :]
             + cz[:, :, None] * pz[:, None, :]
             - (ax * px + az * pz)[:, None, :])               # [N,C,K]
    wlen2 = ((cx * cx + cz * cz)[:, :, None]
             - 2.0 * (cx[:, :, None] * ax[:, None, :]
                      + cz[:, :, None] * az[:, None, :])
             + (ax * ax + az * az)[:, None, :])
    wlen = jnp.sqrt(jnp.maximum(wlen2, 0.0))
    inside = along > wlen * cos_t[:, None, :] + _EPS
    inside = inside & neigh_valid[:, None, :]
    violation = jnp.where(inside, along - wlen * cos_t[:, None, :], 0.0)
    num_viol = jnp.sum(inside, axis=-1)                       # [N,C]
    total_viol = jnp.sum(violation, axis=-1)

    # ---- pick: feasible nearest vpref; else least-violating -----------------
    d_vpref = jnp.linalg.norm(cand - vpref[:, None, :], axis=-1)
    score = d_vpref + _BIG * num_viol + total_viol
    best = jnp.argmin(score, axis=1)
    newv = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0, :]

    return jnp.where(active[..., None], newv, vpref)
