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
                 out_ref):
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
    d2 = jnp.sum((cpos - pos[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cmask, d2, jnp.inf)
    (npos, nvel, nrad, nstat), nvalid = _topk_select(
        d2, [cpos, cvel, crad, cstatic.astype(jnp.float32)],
        MAX_NEIGHBOURS)
    nstat = nstat > 0.5
    nvel = jnp.where(nstat[..., None], 0.0, nvel)

    # ---- HRVO cones (ref: clearpath.c:130-247; ops/clearpath.py) ----------
    rel = npos - pos[:, None, :]
    dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    comb_r = (radius[:, None] + nrad) * 1.05
    colliding = nvalid & (dist < comb_r)
    p_hat = rel / jnp.maximum(dist, _EPS)[..., None]
    sin_t = jnp.clip(comb_r / jnp.maximum(dist, _EPS), 0.0, 1.0)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 0.0))
    cos_t = jnp.where(colliding, 0.0, cos_t)
    rvo_apex = (vel[:, None, :] + nvel) / 2.0
    apex = jnp.where(nstat[..., None], nvel, rvo_apex)
    rot_l = jnp.stack(
        [cos_t * p_hat[..., 0] - sin_t * p_hat[..., 1],
         sin_t * p_hat[..., 0] + cos_t * p_hat[..., 1]], axis=-1)
    rot_r = jnp.stack(
        [cos_t * p_hat[..., 0] + sin_t * p_hat[..., 1],
         -sin_t * p_hat[..., 0] + cos_t * p_hat[..., 1]], axis=-1)

    # ---- candidates (ref: clearpath.c:321-367) ----------------------------
    w = vpref[:, None, :] - apex
    proj_l = apex + rot_l * jnp.maximum(
        jnp.sum(w * rot_l, axis=-1, keepdims=True), 0.0)
    proj_r = apex + rot_r * jnp.maximum(
        jnp.sum(w * rot_r, axis=-1, keepdims=True), 0.0)
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
    cspeed = jnp.sqrt(jnp.sum(cand * cand, axis=-1))
    cscale = jnp.where(cspeed > max_speed[:, None],
                       max_speed[:, None] / jnp.maximum(cspeed, _EPS), 1.0)
    cand = cand * cscale[..., None]

    # ---- feasibility + pick (ref: clearpath.c:368-388) --------------------
    wc = cand[:, :, None, :] - apex[:, None, :, :]         # [B, C, K, 2]
    wlen = jnp.sqrt(jnp.sum(wc * wc, axis=-1))
    along = jnp.sum(wc * p_hat[:, None, :, :], axis=-1)
    inside = (along > wlen * cos_t[:, None, :] + _EPS) & nvalid[:, None, :]
    violation = jnp.where(inside, along - wlen * cos_t[:, None, :], 0.0)
    num_viol = jnp.sum(inside.astype(jnp.float32), axis=-1)
    total_viol = jnp.sum(violation, axis=-1)
    d_vpref = jnp.sqrt(jnp.sum(
        (cand - vpref[:, None, :]) ** 2, axis=-1))
    score = d_vpref + _BIG * num_viol + total_viol        # [B, C]
    smin = jnp.min(score, axis=1, keepdims=True)
    pick = (score == smin) & (jnp.cumsum(score == smin, axis=1) == 1)
    out_ref[...] = jnp.sum(pick[..., None] * cand, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hrvo_select_pallas(
    pos, vel, radius, vpref, max_speed,          # [N,2],[N,2],[N],[N,2],[N]
    cand_pos, cand_vel, cand_rad,                # [N,C2,2],[N,C2,2],[N,C2]
    cand_valid, cand_static,                     # bool[N,C2] x2
    *, interpret: bool = False,
):
    """Fused top-K + HRVO solve. Returns f32[N, 2] new velocities (callers
    apply their own active-mask, like clearpath.new_velocities)."""
    n, c2 = cand_valid.shape
    pad = (-n) % BLOCK
    def p(x, fill=0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)
    args = (p(pos), p(vel), p(radius)[:, None], p(vpref),
            p(max_speed)[:, None], p(cand_pos), p(cand_vel), p(cand_rad),
            p(cand_valid).astype(jnp.float32),
            p(cand_static).astype(jnp.float32))
    nb = (n + pad) // BLOCK
    ms = pl.ANY if interpret else pltpu.VMEM

    def spec(x):
        blk = (BLOCK,) + x.shape[1:]
        return pl.BlockSpec(blk, lambda i: (i,) + (0,) * (x.ndim - 1),
                            memory_space=ms)

    out = pl.pallas_call(
        _hrvo_kernel,
        grid=(nb,),
        in_specs=[spec(a) for a in args],
        out_specs=pl.BlockSpec((BLOCK, 2), lambda i: (i, 0),
                               memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((n + pad, 2), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:n]


def select_crowd_backend():
    """The crowd-velocity callable: the fused Pallas kernel when explicitly
    enabled (directly-attached TPUs), else None (XLA knn+clearpath path).
    PFTPU_PALLAS_INTERPRET=1 runs the kernel through the interpreter
    (CI/CPU validation of the gated path)."""
    if os.environ.get("PFTPU_USE_PALLAS") == "1":
        interpret = os.environ.get("PFTPU_PALLAS_INTERPRET") == "1"
        return functools.partial(hrvo_select_pallas, interpret=interpret)
    return None
