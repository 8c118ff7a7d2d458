"""Pallas TPU kernel for flow-field integration: VMEM-resident relaxation.

The XLA implementation (ops/flowfield.py) round-trips the [K, 64, 64]
field through HBM on every while_loop step. This kernel keeps one chunk's
cost + integration field entirely in VMEM (64x64 f32 = 16 KB each, far
under the ~16 MB budget) and runs the whole min-plus relaxation on the VPU
with zero HBM traffic between iterations — one grid program per chunk, so
a batch of K chunks occupies K sequential grid steps with pipelined
HBM<->VMEM block transfers.

Neighbour shifts use pltpu.roll + border masking (Mosaic supports roll
natively; jnp.pad on values does not lower as well).

Availability: Mosaic remote-compile is not functional through this
environment's TPU relay (compiles hang), so `integrate_pallas` is exercised
in interpreter mode by tests and `select_backend()` falls back to the XLA
path unless PFTPU_USE_PALLAS=1. On a directly-attached TPU the kernel
compiles normally.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from permafrost_engine_tpu.core.config import (
    COST_IMPASSABLE,
    FIELD_RES,
    FLOW_DIR_OFFSETS,
    INF_COST,
)

SQRT2 = 1.4142135623730951
_OFFSETS = FLOW_DIR_OFFSETS[1:]
_STEP_LEN = tuple(SQRT2 if (dr and dc) else 1.0 for dr, dc in _OFFSETS)


def _shift(x: jax.Array, dr: int, dc: int, fill: float) -> jax.Array:
    """Neighbour value at (r+dr, c+dc) via roll + border fill (VMEM-local)."""
    h, w = x.shape
    out = x
    if dr != 0:
        # out[r] = x[r + dr]; rows whose source falls outside get `fill`
        out = pltpu.roll(out, (-dr) % h, 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        bad = (rows >= h - dr) if dr > 0 else (rows < -dr)
        out = jnp.where(bad, fill, out)
    if dc != 0:
        out = pltpu.roll(out, (-dc) % w, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        bad = (cols >= w - dc) if dc > 0 else (cols < -dc)
        out = jnp.where(bad, fill, out)
    return out


def _integrate_kernel(cost_ref, seed_ref, scost_ref, out_ref):
    cost = cost_ref[0]
    seed = seed_ref[0] != 0
    scost = scost_ref[0]
    passable = cost != COST_IMPASSABLE
    step = jnp.where(passable, cost.astype(jnp.float32), INF_COST)
    integ0 = jnp.where(seed & passable, scost, INF_COST)

    pass_shift = {
        (dr, dc): _shift(passable.astype(jnp.float32), dr, dc, 0.0) > 0.5
        for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)
    }

    def relax(integ):
        best = integ
        for (dr, dc), slen in zip(_OFFSETS, _STEP_LEN):
            cand = _shift(integ, dr, dc, INF_COST) + step * slen
            if dr != 0 and dc != 0:
                ok = pass_shift[(dr, 0)] & pass_shift[(0, dc)]
                cand = jnp.where(ok, cand, INF_COST)
            best = jnp.minimum(best, cand)
        return jnp.where(passable, best, INF_COST)

    def cond(carry):
        i, integ, done = carry
        return jnp.logical_and(jnp.logical_not(done), i < 4 * FIELD_RES)

    def body(carry):
        i, integ, _ = carry
        new = integ
        for _ in range(8):
            new = relax(new)
        return i + 8, new, jnp.all(new == integ)

    _, integ, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), integ0, jnp.bool_(False)))
    out_ref[0] = jnp.where(seed & passable, scost, integ)


@functools.partial(jax.jit, static_argnames=("interpret",))
def integrate_pallas(cost: jax.Array, seed_mask: jax.Array,
                     seed_cost: jax.Array | None = None,
                     *, interpret: bool = False) -> jax.Array:
    """Batched per-chunk integration. cost u8[K, H, W], seed bool[K, H, W],
    seed_cost optional f32[K, H, W] initial seed values (union fields)."""
    k, h, w = cost.shape
    if seed_cost is None:
        seed_cost = jnp.zeros((k, h, w), jnp.float32)
    ms = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        _integrate_kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((k, h, w), jnp.float32),
        interpret=interpret,
    )(cost, seed_mask.astype(jnp.uint8), seed_cost.astype(jnp.float32))


def select_backend():
    """Return the per-chunk integration callable: the Pallas kernel when
    explicitly enabled (directly-attached TPUs; PFTPU_PALLAS_INTERPRET=1
    for CI validation through the interpreter), else the XLA path."""
    from permafrost_engine_tpu.ops import flowfield as ff

    if os.environ.get("PFTPU_USE_PALLAS") == "1":
        interpret = os.environ.get("PFTPU_PALLAS_INTERPRET") == "1"

        def pallas_integrate(cost, seeds, seed_cost=None, **_kw):
            return integrate_pallas(cost, seeds, seed_cost,
                                    interpret=interpret)
        return pallas_integrate
    return ff.integrate
