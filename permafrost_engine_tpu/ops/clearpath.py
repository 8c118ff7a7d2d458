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


@functools.partial(jax.jit, static_argnames=("exact",))
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
    exact: bool = False,   # reference-exact geometry + candidate set
) -> jax.Array:
    """Feasible velocity nearest vpref per entity (G_ClearPath_NewVelocity,
    ref: src/game/clearpath.c:694).

    `exact=True` switches to the reference's EXACT construction: tangent-
    point cone edges (compute_vo_edges, clearpath.c:130-175), true HRVO
    apexes (the near RVO leg x far VO leg intersection, clearpath.c:
    176-215), and pairwise cone-edge INTERSECTION candidates + unclamped
    vdes edge projections (clearpath.c:321-367) — still one dense masked
    tensor program, [N, R, R] ray pairs over the nearest cones.

    Returns f32[N,2] new velocities; inactive entities return vpref.
    """
    n, k = neigh_idx.shape
    ni = jnp.clip(neigh_idx, 0, n - 1)
    npos = pos[ni] if neigh_pos is None else neigh_pos  # [N,K,2]
    nvel = vel[ni] if neigh_vel is None else neigh_vel
    nvel = jnp.where(neigh_static[..., None], 0.0, nvel)
    nrad = radius[ni] if neigh_rad is None else neigh_rad
    # sanitize INVALID cone rows: grid-payload sentinels can be huge and
    # overflow f32 through the exact-mode apex-slide/intersection math
    # (inf - inf = NaN in the decomposed |w|^2) — collapse them onto the
    # entity itself (zero-extent cone the masks already exclude)
    npos = jnp.where(neigh_valid[..., None], npos, pos[:, None, :])
    nvel = jnp.where(neigh_valid[..., None], nvel, 0.0)
    nrad = jnp.where(neigh_valid, nrad, 0.0)

    rel = npos - pos[:, None, :]                    # [N,K,2]
    dist = jnp.linalg.norm(rel, axis=-1)            # [N,K]
    comb_r = (radius[:, None] + nrad) * (1.0 if exact else 1.05)
    colliding = neigh_valid & (dist < comb_r)

    p_hat = rel / jnp.maximum(dist, _EPS)[..., None]
    if exact:
        # reference edges pass through (neighb_pos +/- perp * R): the
        # half-angle is atan(R/d), slightly narrower than the tangent
        # cone (compute_vo_edges, clearpath.c:130-175)
        hyp = jnp.sqrt(dist * dist + comb_r * comb_r)
        sin_t = comb_r / jnp.maximum(hyp, _EPS)
        cos_t = dist / jnp.maximum(hyp, _EPS)
    else:
        # tangent cone: sin(theta) = R / |p| (clamped below 1 when apart)
        sin_t = jnp.clip(comb_r / jnp.maximum(dist, _EPS), 0.0, 1.0)
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    # colliding neighbours become half-plane obstacles (cos 0 -> 90deg
    # cone). The exact mode keeps the reference's construction, which
    # never special-cases overlap (compute_vo_edges works through it);
    # overlap resolution is the integrator's de-penetration pass.
    if not exact:
        cos_t = jnp.where(colliding, 0.0, cos_t)
        sin_t = jnp.where(colliding, 1.0, sin_t)

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

    if exact:
        # true HRVO apex (compute_hrvo, clearpath.c:176-215): when the
        # entity's velocity is left of the cone centerline, slide the
        # apex to the intersection of the RVO's LEFT leg with the VO's
        # RIGHT leg (and mirrored) — batched line-line solves
        def _x(d):
            return d[..., 0]

        def _z(d):
            return d[..., 1]

        # NOTE on conventions: the reference's LEFT edge is p_hat rotated
        # by -theta (clearpath.c builds it through p_j - perp*R), which is
        # our rot_r; its RIGHT edge is our rot_l.
        center = rot_l + rot_r                                # [N,K,2]
        vdet = (_x(center) * vel[:, None, 1]
                - _z(center) * vel[:, None, 0])               # [N,K]
        near = jnp.where(vdet[..., None] > 0, rot_r, rot_l)
        other = jnp.where(vdet[..., None] > 0, rot_l, rot_r)
        denom = _x(near) * _z(other) - _z(near) * _x(other)
        dp = vo_apex - rvo_apex
        t = jnp.where(jnp.abs(denom) > _EPS,
                      (_x(dp) * _z(other) - _z(dp) * _x(other))
                      / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0), 0.0)
        # near-parallel legs put the intersection arbitrarily far out;
        # bound it so downstream squares stay inside f32
        t = jnp.clip(t, -1e4, 1e4)
        hrvo_apex = rvo_apex + near * t[..., None]
        slide_ok = (jnp.abs(denom) > _EPS) & (jnp.abs(vdet) > _EPS)
        apex = jnp.where(
            neigh_static[..., None], vo_apex,
            jnp.where(slide_ok[..., None], hrvo_apex, rvo_apex))

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

    if exact:
        # reference-exact candidates (clearpath.c:321-367):
        #  * pairwise RAY-RAY intersections over the nearest KX cones'
        #    2KX edges — STATIC upper-triangle pair list (each unordered
        #    pair once; the old [N,R,R] square carried 136 masked
        #    duplicates per entity straight into the [N,C,K] cone test,
        #    the movement tick's dominant tensor)
        #  * vdes projected on each edge as a FREE VECTOR (apex +
        #    d*dot(d, vdes), no clamp — compute_vdes_proj_points)
        import numpy as _np
        kx = min(8, k)
        ra = jnp.concatenate([apex[:, :kx], apex[:, :kx]], axis=1)
        rd = jnp.concatenate([rot_l[:, :kx], rot_r[:, :kx]], axis=1)
        rv = jnp.concatenate([neigh_valid[:, :kx]] * 2, axis=1)  # [N,R]
        r2 = 2 * kx
        iu, ju = _np.triu_indices(r2, k=1)                   # static [P]
        p1, d1 = ra[:, iu], rd[:, iu]                        # [N,P,2]
        p2, d2 = ra[:, ju], rd[:, ju]
        det = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]  # [N,P]
        dp2 = p2 - p1
        safe = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        t1 = (dp2[..., 0] * d2[..., 1] - dp2[..., 1] * d2[..., 0]) / safe
        t2 = (dp2[..., 0] * d1[..., 1] - dp2[..., 1] * d1[..., 0]) / safe
        xpt = p1 + d1 * t1[..., None]                        # [N,P,2]
        ok = ((jnp.abs(det) > _EPS) & (t1 >= 0.0) & (t2 >= 0.0)
              & rv[:, iu] & rv[:, ju])
        # invalid pairs collapse onto vpref (a duplicate candidate)
        xcand = jnp.where(ok[..., None], xpt, vpref[:, None, :])
        # unclamped free-vector projections on every edge
        wl = jnp.sum(vpref[:, None, :] * rot_l, axis=-1, keepdims=True)
        wr = jnp.sum(vpref[:, None, :] * rot_r, axis=-1, keepdims=True)
        free_l = apex + rot_l * wl                            # [N,K,2]
        free_r = apex + rot_r * wr
        cand = jnp.concatenate([cand, xcand, free_l, free_r], axis=1)

    # clamp candidate speeds
    if not exact:
        cspeed = jnp.linalg.norm(cand, axis=-1)
        cscale = jnp.where(
            cspeed > max_speed_tick[:, None],
            max_speed_tick[:, None] / jnp.maximum(cspeed, _EPS), 1.0)
        cand = cand * cscale[..., None]
    # exact mode scores candidates UNCLAMPED (the reference never clamps
    # its candidate set — a feasible point beyond max speed still beats
    # an infeasible nearer one) and clamps the winner after the pick

    # ---- feasibility: candidate outside every cone --------------------------
    # The cone-test tensors dominate movement bandwidth. Build them
    # DIRECTLY from [N,C] x [N,K] broadcast products — decomposing
    #   w.p_hat = cand.p_hat - apex.p_hat
    #   |w|^2   = |cand|^2 - 2 cand.apex + |apex|^2
    # skips the [.,.,.,2] difference tensor entirely, so the whole cone
    # test fuses into the per-[N,C] violation reductions (f32: the
    # cancellation in |w|^2 near the apex is below f32 noise, not bf16's).
    #
    # LAYOUT: the exact mode's big candidate set (C ~ 241) uses
    # [N, K, C] — C on the LANE dim (241 -> 2 full 128-lane registers vs
    # K=32 = 25% lane occupancy), and the cascade below then indexes
    # along the K (sublane) axis with whole-[C] rows. Measured 82.6 ->
    # 8.2 ms at N=10k: the [N,C,K] form's cascade gather
    # (take_along_axis on the minor axis) was ~124M element fetches.
    # The fan mode keeps the small-C [N,C,K] form.
    cx, cz = cand[..., 0], cand[..., 1]                       # [N,C]
    ax, az = apex[..., 0], apex[..., 1]                       # [N,K]
    px, pz = p_hat[..., 0], p_hat[..., 1]                     # [N,K]
    d_vpref = jnp.linalg.norm(cand - vpref[:, None, :], axis=-1)
    if exact:
        along = (px[:, :, None] * cx[:, None, :]
                 + pz[:, :, None] * cz[:, None, :]
                 - (ax * px + az * pz)[:, :, None])           # [N,K,C]
        wlen2 = ((cx * cx + cz * cz)[:, None, :]
                 - 2.0 * (ax[:, :, None] * cx[:, None, :]
                          + az[:, :, None] * cz[:, None, :])
                 + (ax * ax + az * az)[:, :, None])
        wlen = jnp.sqrt(jnp.maximum(wlen2, 0.0))
        # the reference's inside_pcr wedge test (clearpath.c:249-296):
        # a point is inside a cone iff it is right of the LEFT edge and
        # left of the RIGHT edge, with EPSILON=1/1024 angular tolerance
        # on NORMALIZED dets — so candidates lying exactly ON an edge
        # (every ray-ray intersection does) robustly count as OUTSIDE
        # despite f32 noise. reference-left = our rot_r.
        _EPS_REF = 1.0 / 1024
        lx, lz = rot_r[..., 0], rot_r[..., 1]                 # [N,K]
        rx, rz = rot_l[..., 0], rot_l[..., 1]
        ldet = (lx[:, :, None] * cz[:, None, :]
                - lz[:, :, None] * cx[:, None, :]
                - (az * lx - ax * lz)[:, :, None])            # [N,K,C]
        rdet = (rx[:, :, None] * cz[:, None, :]
                - rz[:, :, None] * cx[:, None, :]
                - (az * rx - ax * rz)[:, :, None])
        tol = _EPS_REF * wlen
        inside = ((wlen >= _EPS_REF) & (ldet >= tol) & (rdet <= -tol)
                  & neigh_valid[:, :, None])
        violation = jnp.where(
            inside, along - wlen * cos_t[:, :, None], 0.0)
        num_viol = jnp.sum(inside, axis=1)                    # [N,C]
        total_viol = jnp.sum(violation, axis=1)
        # remove_furthest retry (clearpath.c:372-390 via the NewVelocity
        # loop): when NO candidate is feasible against all K cones, the
        # reference drops the farthest neighbour and re-solves until one
        # is. Dense equivalent: per entity pick the LONGEST near->far
        # cone prefix that still admits a feasible candidate, then score
        # against that prefix only. The prefix violation counts come from
        # ONE MXU contraction — cum[n,j,c] = sum_k inside[n,k,c] *
        # (rank[n,k] <= j) — instead of sort + minor-axis gather +
        # cumsum (rank from a [N,K,K] stable comparison; counts <= K are
        # exact in bf16, accumulated f32).
        dsort = jnp.where(neigh_valid, dist, jnp.inf)
        kio = jnp.arange(k, dtype=jnp.int32)
        lower = (dsort[:, :, None] > dsort[:, None, :]) | (
            (dsort[:, :, None] == dsort[:, None, :])
            & (kio[:, None] > kio[None, :])[None])
        rank = jnp.sum(lower, axis=2)                         # [N,K]
        pref = (rank[:, :, None] <= kio[None, None, :])       # [N,K,J]
        cum = jnp.einsum(
            "nkc,nkj->njc", inside.astype(jnp.bfloat16),
            pref.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)               # [N,J,C]
        any_m = jnp.any(cum < 0.5, axis=2)                    # [N,J]
        # largest prefix length with >= 1 feasible candidate (0 if none)
        m_star = jnp.sum(jnp.cumprod(any_m.astype(jnp.int32),
                                     axis=1), axis=1)         # [N]
        mi = jnp.maximum(m_star - 1, 0)
        sel = (kio[None, :, None] == mi[:, None, None])
        viol_star = jnp.sum(jnp.where(sel, cum, 0.0), axis=1)  # [N,C]
        viol_star = jnp.where((m_star > 0)[:, None], viol_star,
                              num_viol.astype(jnp.float32))
        score = d_vpref + _BIG * viol_star + total_viol
    else:
        along = (cx[:, :, None] * px[:, None, :]
                 + cz[:, :, None] * pz[:, None, :]
                 - (ax * px + az * pz)[:, None, :])           # [N,C,K]
        wlen2 = ((cx * cx + cz * cz)[:, :, None]
                 - 2.0 * (cx[:, :, None] * ax[:, None, :]
                          + cz[:, :, None] * az[:, None, :])
                 + (ax * ax + az * az)[:, None, :])
        wlen = jnp.sqrt(jnp.maximum(wlen2, 0.0))
        inside = ((along > wlen * cos_t[:, None, :] + _EPS)
                  & neigh_valid[:, None, :])
        violation = jnp.where(
            inside, along - wlen * cos_t[:, None, :], 0.0)
        num_viol = jnp.sum(inside, axis=-1)                   # [N,C]
        total_viol = jnp.sum(violation, axis=-1)
        # ---- pick: feasible nearest vpref; else least-violating ----------
        score = d_vpref + _BIG * num_viol + total_viol
    best = jnp.argmin(score, axis=1)
    newv = jnp.take_along_axis(cand, best[:, None, None], axis=1)[:, 0, :]

    if exact:
        speed = jnp.linalg.norm(newv, axis=-1, keepdims=True)
        newv = jnp.where(speed > max_speed_tick[:, None],
                         newv * (max_speed_tick[:, None]
                                 / jnp.maximum(speed, _EPS)), newv)

    return jnp.where(active[..., None], newv, vpref)
