"""Pallas TPU kernel: fused neighbour top-k + HRVO velocity solve.

The XLA movement pipeline materialises the candidate set [N, W2*cap], an
approx-top-k selection, and the [N, C, K] cone tensors through HBM
(ops/grid.knn_query + ops/clearpath.new_velocities — measured ~8 ms of
the 25 ms movement substep at 10k entities). This kernel keeps one
128-entity block's candidates entirely in VMEM and fuses:

  distance² -> EXACT top-K selection (one-hot extraction, K unrolled)
  -> HRVO cone construction -> candidate-velocity evaluation -> pick

into a single grid program with no intermediate HBM traffic. The cone
math mirrors ops/clearpath.py exactly (ref: src/game/clearpath.c:130-388,
shaders/compute/movement.glsl), so an interpret-mode test checks it
against the XLA path with exact top-k.

Availability: Mosaic remote-compile is not functional through this
environment's TPU relay (compiles hang), so the kernel is exercised in
interpreter mode by tests and `select_crowd_backend()` falls back to the
XLA path unless PFTPU_USE_PALLAS=1. On a directly-attached TPU it
compiles normally.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from permafrost_engine_tpu.core.config import MAX_NEIGHBOURS

_EPS = 1e-6
_BIG = 1e9
BLOCK = 128

# candidate-velocity fan, mirrored from ops/clearpath.py
_SCALES = (1.0, 0.75, 0.5, 0.25, 0.0)
_ANGLES_DEG = (15.0, -15.0, 30.0, -30.0, 45.0, -45.0, 70.0, -70.0,
               90.0, -90.0)


def _topk_select(d2, arrays, k):
    """Exact nearest-k extraction by repeated masked-min + one-hot reduce.

    d2: [B, C] squared distances (inf where invalid). arrays: list of
    [B, C] (or [B, C, 2]) tensors to select from. Returns
    (list of [B, k(,2)] selections, valid [B, k]). K is unrolled — each
    step is a row-min + compare + weighted sum, all VPU-friendly; no
    gather instructions at all."""
    outs = [[] for _ in arrays]
    valid = []
    for _ in range(k):
        dmin = jnp.min(d2, axis=1, keepdims=True)              # [B, 1]
        is_min = d2 == dmin
        first = is_min & (jnp.cumsum(is_min, axis=1) == 1)     # [B, C]
        w = first.astype(jnp.float32)
        for oi, a in enumerate(arrays):
            if a.ndim == 3:
                outs[oi].append(jnp.sum(w[..., None] * a, axis=1))
            else:
                outs[oi].append(jnp.sum(w * a, axis=1))
        valid.append(jnp.isfinite(dmin[:, 0]))
        d2 = jnp.where(first, jnp.inf, d2)
    sel = [jnp.stack(o, axis=1) for o in outs]
    return sel, jnp.stack(valid, axis=1)


def _hrvo_kernel(pos_ref, vel_ref, radius_ref, vpref_ref, maxsp_ref,
                 cpos_ref, cvel_ref, crad_ref, cmask_ref, cstatic_ref,
                 out_ref, *, exact: bool = False):
    pos = pos_ref[...]
    vel = vel_ref[...]
    radius = radius_ref[...][:, 0]
    vpref = vpref_ref[...]
    max_speed = maxsp_ref[...][:, 0]
    cpos = cpos_ref[...]                       # [B, C2, 2]
    cvel = cvel_ref[...]
    crad = crad_ref[...]                       # [B, C2]
    cmask = cmask_ref[...] > 0                 # valid candidate
    cstatic = cstatic_ref[...] > 0

    # ---- exact top-K nearest neighbours, no gathers ----------------------
    # (selection emits neighbours NEAR -> FAR: the exact mode's
    # remove-furthest cascade below rides that order for free, where the
    # XLA path needs an argsort)
    d2 = jnp.sum((cpos - pos[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cmask, d2, jnp.inf)
    (npos, nvel, nrad, nstat), nvalid = _topk_select(
        d2, [cpos, cvel, crad, cstatic.astype(jnp.float32)],
        MAX_NEIGHBOURS)
    nstat = (nstat > 0.5) & nvalid
    nvel = jnp.where(nstat[..., None], 0.0, nvel)
    # sanitize INVALID selected rows onto the entity itself: once the valid
    # candidates run out, the masked-min one-hot lands on the FIRST
    # inf-distance row and sums out its grid-payload SENTINEL values (not
    # zeros) — huge positions/velocities that overflow f32 through the
    # exact-mode apex-slide/intersection math into NaN candidates, and one
    # NaN score collapses the min-pick one-hot to all-False (= zero
    # velocity, a frozen unit). Mirrors ops/clearpath.py:69-75.
    npos = jnp.where(nvalid[..., None], npos, pos[:, None, :])
    nvel = jnp.where(nvalid[..., None], nvel, 0.0)
    nrad = jnp.where(nvalid, nrad, 0.0)
    k = MAX_NEIGHBOURS

    # ---- HRVO cones (ref: clearpath.c:130-247; ops/clearpath.py) ----------
    rel = npos - pos[:, None, :]
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    comb_r = (radius[:, None] + nrad) * (1.0 if exact else 1.05)
    colliding = nvalid & (dist < comb_r)
    p_hat = rel / jnp.maximum(dist, _EPS)[..., None]
    if exact:
        # edges through (neighb_pos +/- perp * R): half-angle atan(R/d)
        # (compute_vo_edges, clearpath.c:130-175)
        hyp = jnp.sqrt(dist * dist + comb_r * comb_r)
        sin_t = comb_r / jnp.maximum(hyp, _EPS)
        cos_t = dist / jnp.maximum(hyp, _EPS)
    else:
        sin_t = jnp.clip(comb_r / jnp.maximum(dist, _EPS), 0.0, 1.0)
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
        cos_t = jnp.where(colliding, 0.0, cos_t)
    rvo_apex = (vel[:, None, :] + nvel) / 2.0
    vo_apex = nvel
    apex = jnp.where(nstat[..., None], vo_apex, rvo_apex)
    rot_l = jnp.stack(
        [cos_t * p_hat[..., 0] - sin_t * p_hat[..., 1],
         sin_t * p_hat[..., 0] + cos_t * p_hat[..., 1]], axis=-1)
    rot_r = jnp.stack(
        [cos_t * p_hat[..., 0] + sin_t * p_hat[..., 1],
         -sin_t * p_hat[..., 0] + cos_t * p_hat[..., 1]], axis=-1)

    if exact:
        # true HRVO apex slide (compute_hrvo, clearpath.c:176-215) —
        # identical math to ops/clearpath.py exact mode
        center = rot_l + rot_r
        vdet = (center[..., 0] * vel[:, None, 1]
                - center[..., 1] * vel[:, None, 0])
        near = jnp.where(vdet[..., None] > 0, rot_r, rot_l)
        other = jnp.where(vdet[..., None] > 0, rot_l, rot_r)
        denom = near[..., 0] * other[..., 1] - near[..., 1] * other[..., 0]
        dp = vo_apex - rvo_apex
        t = jnp.where(jnp.abs(denom) > _EPS,
                      (dp[..., 0] * other[..., 1]
                       - dp[..., 1] * other[..., 0])
                      / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0), 0.0)
        t = jnp.clip(t, -1e4, 1e4)
        hrvo_apex = rvo_apex + near * t[..., None]
        slide_ok = (jnp.abs(denom) > _EPS) & (jnp.abs(vdet) > _EPS)
        apex = jnp.where(
            nstat[..., None], vo_apex,
            jnp.where(slide_ok[..., None], hrvo_apex, rvo_apex))

    # ---- candidates (ref: clearpath.c:321-367) ----------------------------
    kp = min(16, k)
    w = vpref[:, None, :] - apex[:, :kp]
    proj_l = apex[:, :kp] + rot_l[:, :kp] * jnp.maximum(
        jnp.sum(w * rot_l[:, :kp], axis=-1, keepdims=True), 0.0)
    proj_r = apex[:, :kp] + rot_r[:, :kp] * jnp.maximum(
        jnp.sum(w * rot_r[:, :kp], axis=-1, keepdims=True), 0.0)
    # the scale/rotation fans are Python-constant scalars (Pallas kernels
    # cannot capture jnp constant arrays)
    import math

    base = jnp.stack([vpref * s for s in _SCALES], axis=1)
    vx, vz = vpref[:, 0], vpref[:, 1]
    rots = []
    for deg in _ANGLES_DEG:
        ca = math.cos(math.radians(deg))
        sa = math.sin(math.radians(deg))
        rots.append(jnp.stack([vx * ca - vz * sa, vx * sa + vz * ca], -1))
    rot = jnp.stack(rots, axis=1)
    rot = jnp.concatenate([rot, rot * 0.5], axis=1)
    cand = jnp.concatenate([base, rot, proj_l, proj_r], axis=1)  # [B,C,2]

    if exact:
        # reference-exact candidate set (clearpath.c:321-367; mirrors
        # ops/clearpath.py exact mode): pairwise cone-edge ray
        # intersections over the nearest kx cones + unclamped free-vector
        # vdes projections on every edge
        kx = min(8, k)
        ra = jnp.concatenate([apex[:, :kx], apex[:, :kx]], axis=1)
        rd = jnp.concatenate([rot_l[:, :kx], rot_r[:, :kx]], axis=1)
        rv = jnp.concatenate([nvalid[:, :kx]] * 2, axis=1)     # [B,R]
        p1, d1 = ra[:, :, None, :], rd[:, :, None, :]
        p2, d2p = ra[:, None, :, :], rd[:, None, :, :]
        det = d1[..., 0] * d2p[..., 1] - d1[..., 1] * d2p[..., 0]
        dpp = p2 - p1
        safe = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
        t1 = (dpp[..., 0] * d2p[..., 1] - dpp[..., 1] * d2p[..., 0]) / safe
        t2 = (dpp[..., 0] * d1[..., 1] - dpp[..., 1] * d1[..., 0]) / safe
        xpt = p1 + d1 * t1[..., None]                          # [B,R,R,2]
        r2 = 2 * kx
        iu = jax.lax.broadcasted_iota(jnp.int32, (r2, r2), 0)
        ju = jax.lax.broadcasted_iota(jnp.int32, (r2, r2), 1)
        ok = ((jnp.abs(det) > _EPS) & (t1 >= 0.0) & (t2 >= 0.0)
              & rv[:, :, None] & rv[:, None, :]
              & (iu < ju)[None])          # upper triangle: (i,j)==(j,i)
        xpt = jnp.where(ok[..., None], xpt, vpref[:, None, None, :])
        xcand = xpt.reshape(xpt.shape[0], r2 * r2, 2)
        wl = jnp.sum(vpref[:, None, :] * rot_l, axis=-1, keepdims=True)
        wr = jnp.sum(vpref[:, None, :] * rot_r, axis=-1, keepdims=True)
        free_l = apex + rot_l * wl
        free_r = apex + rot_r * wr
        cand = jnp.concatenate([cand, xcand, free_l, free_r], axis=1)
        # exact mode scores candidates UNCLAMPED; the winner clamps after
        # the pick (the reference's ordering)
    else:
        cspeed = jnp.sqrt(jnp.sum(cand * cand, axis=-1))
        cscale = jnp.where(
            cspeed > max_speed[:, None],
            max_speed[:, None] / jnp.maximum(cspeed, _EPS), 1.0)
        cand = cand * cscale[..., None]

    # ---- feasibility + pick (ref: clearpath.c:368-388) --------------------
    # decomposed broadcast products (no [B,C,K,2] difference tensor), the
    # same formulation as ops/clearpath.py
    cx, cz = cand[..., 0], cand[..., 1]                    # [B,C]
    ax, az = apex[..., 0], apex[..., 1]                    # [B,K]
    px, pz = p_hat[..., 0], p_hat[..., 1]
    along = (cx[:, :, None] * px[:, None, :]
             + cz[:, :, None] * pz[:, None, :]
             - (ax * px + az * pz)[:, None, :])            # [B,C,K]
    wlen2 = ((cx * cx + cz * cz)[:, :, None]
             - 2.0 * (cx[:, :, None] * ax[:, None, :]
                      + cz[:, :, None] * az[:, None, :])
             + (ax * ax + az * az)[:, None, :])
    wlen = jnp.sqrt(jnp.maximum(wlen2, 0.0))
    if exact:
        # inside_pcr wedge test with the reference's 1/1024 angular
        # tolerance (clearpath.c:249-296); reference-left = our rot_r
        _EPS_REF = 1.0 / 1024
        lx, lz = rot_r[..., 0], rot_r[..., 1]
        rx, rz = rot_l[..., 0], rot_l[..., 1]
        ldet = (cz[:, :, None] * lx[:, None, :]
                - cx[:, :, None] * lz[:, None, :]
                - (az * lx - ax * lz)[:, None, :])
        rdet = (cz[:, :, None] * rx[:, None, :]
                - cx[:, :, None] * rz[:, None, :]
                - (az * rx - ax * rz)[:, None, :])
        tol = _EPS_REF * wlen
        inside = (wlen >= _EPS_REF) & (ldet >= tol) & (rdet <= -tol)
    else:
        inside = along > wlen * cos_t[:, None, :] + _EPS
    inside = inside & nvalid[:, None, :]
    violation = jnp.where(inside, along - wlen * cos_t[:, None, :], 0.0)
    num_viol = jnp.sum(inside.astype(jnp.float32), axis=-1)
    total_viol = jnp.sum(violation, axis=-1)
    d_vpref = jnp.sqrt(jnp.sum(
        (cand - vpref[:, None, :]) ** 2, axis=-1))
    if exact:
        # remove_furthest retry as a prefix-feasibility cascade
        # (clearpath.c:372-390): neighbours are ALREADY near->far from
        # _topk_select, so the longest feasible cone prefix is one cumsum
        # + cumprod; the prefix's violation count extracts via a one-hot
        # contraction over K (no gathers in-kernel)
        cum = jnp.cumsum(inside.astype(jnp.float32), axis=2)   # [B,C,K]
        any_m = jnp.any(cum == 0.0, axis=1)                    # [B,K]
        m_star = jnp.sum(jnp.cumprod(any_m.astype(jnp.float32),
                                     axis=1), axis=1)          # [B]
        mi = jnp.maximum(m_star - 1.0, 0.0)
        kio = jax.lax.broadcasted_iota(jnp.float32, (1, 1, k), 2)
        onehot = (kio == mi[:, None, None]).astype(jnp.float32)
        viol_star = jnp.sum(cum * onehot, axis=2)              # [B,C]
        viol_star = jnp.where((m_star > 0.0)[:, None], viol_star, num_viol)
        score = d_vpref + _BIG * viol_star + total_viol
    else:
        score = d_vpref + _BIG * num_viol + total_viol         # [B,C]
    smin = jnp.min(score, axis=1, keepdims=True)
    pick = (score == smin) & (jnp.cumsum(score == smin, axis=1) == 1)
    newv = jnp.sum(pick[..., None] * cand, axis=1)
    if exact:
        speed = jnp.sqrt(jnp.sum(newv * newv, axis=-1))[:, None]
        newv = jnp.where(speed > max_speed[:, None],
                         newv * (max_speed[:, None]
                                 / jnp.maximum(speed, _EPS)), newv)
    out_ref[...] = newv


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def hrvo_select_pallas(
    pos, vel, radius, vpref, max_speed,          # [N,2],[N,2],[N],[N,2],[N]
    cand_pos, cand_vel, cand_rad,                # [N,C2,2],[N,C2,2],[N,C2]
    cand_valid, cand_static,                     # bool[N,C2] x2
    *, interpret: bool = False, exact: bool = False,
):
    """Fused top-K + HRVO solve. Returns f32[N, 2] new velocities (callers
    apply their own active-mask, like clearpath.new_velocities).

    `exact=True` mirrors ops/clearpath.py's reference-exact construction
    (tangent-point edges, HRVO apex slide, pairwise edge-intersection
    candidates, inside_pcr wedge test, remove-furthest prefix cascade).
    The exact candidate tensor is ~12x larger ([B, 377, K] feasibility),
    so the block shrinks to keep the working set inside VMEM."""
    n, c2 = cand_valid.shape
    block = 32 if exact else BLOCK
    pad = (-n) % block
    def p(x, fill=0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)
    args = (p(pos), p(vel), p(radius)[:, None], p(vpref),
            p(max_speed)[:, None], p(cand_pos), p(cand_vel), p(cand_rad),
            p(cand_valid).astype(jnp.float32),
            p(cand_static).astype(jnp.float32))
    nb = (n + pad) // block
    ms = pl.ANY if interpret else pltpu.VMEM

    def spec(x):
        blk = (block,) + x.shape[1:]
        return pl.BlockSpec(blk, lambda i: (i,) + (0,) * (x.ndim - 1),
                            memory_space=ms)

    out = pl.pallas_call(
        functools.partial(_hrvo_kernel, exact=exact),
        grid=(nb,),
        in_specs=[spec(a) for a in args],
        out_specs=pl.BlockSpec((block, 2), lambda i: (i, 0),
                               memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((n + pad, 2), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:n]


def select_crowd_backend(exact: bool = False):
    """The crowd-velocity callable: the fused Pallas kernel when explicitly
    enabled (directly-attached TPUs), else None (XLA knn+clearpath path).
    PFTPU_PALLAS_INTERPRET=1 runs the kernel through the interpreter
    (CI/CPU validation of the gated path). `exact` follows
    cfg.clearpath_exact so both backends run the same candidate
    construction."""
    if os.environ.get("PFTPU_USE_PALLAS") == "1":
        interpret = os.environ.get("PFTPU_PALLAS_INTERPRET") == "1"
        return functools.partial(hrvo_select_pallas, interpret=interpret,
                                 exact=exact)
    return None
