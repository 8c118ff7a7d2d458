"""Connected-component island labeling over nav grids.

The reference assigns global island ids per nav tile with a serial
flood fill (ref: n_visit_island, src/navigation/nav.c:856) and rejects
path requests whose endpoints lie on different islands before touching
A* (nav.c:1806-1811). The TPU formulation is iterative min-label
propagation (pointer-jumping flavoured): every tile starts with its own
linear id and repeatedly takes the min over its passable neighbours —
the same stencil machinery as field integration, batched over layers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import COST_IMPASSABLE
from permafrost_engine_tpu.ops.flowfield import shift2d

_OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_islands(cost: jax.Array, *, max_iters: int = 4096) -> jax.Array:
    """Island ids per tile: i32[..., H, W]; -1 on impassable tiles.
    Connectivity matches pathing (8-neighbour, no corner cutting)."""
    passable = cost != COST_IMPASSABLE
    h, w = cost.shape[-2], cost.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(h * w)
    init = jnp.where(passable, rows * w + cols, big)

    ortho = {
        (dr, dc): shift2d(passable, dr, dc, False)
        for (dr, dc) in ((-1, 0), (1, 0), (0, -1), (0, 1))
    }

    def sweep(lab):
        best = lab
        for dr, dc in _OFFS:
            cand = shift2d(lab, dr, dc, big)
            if dr != 0 and dc != 0:
                ok = ortho[(dr, 0)] & ortho[(0, dc)]
                cand = jnp.where(ok, cand, big)
            best = jnp.minimum(best, cand)
        return jnp.where(passable, best, big)

    def cond(carry):
        i, lab, done = carry
        return (~done) & (i < max_iters)

    def body(carry):
        i, lab, _ = carry
        new = jax.lax.fori_loop(0, 16, lambda _, x: sweep(x), lab)
        return i + 16, new, jnp.all(new == lab)

    _, lab, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init, jnp.bool_(False)))
    return jnp.where(passable, lab, -1)


@jax.jit
def label_local_islands(cost: jax.Array, blockers: jax.Array) -> jax.Array:
    """Per-chunk local island labels over cost WITH live unit blockers
    stamped impassable: i32[K, F, F], -1 on blocked tiles.

    The reference maintains blocker-aware ``local_islands`` per chunk and
    uses them to filter A* hops through corridors plugged by parked units
    (ref: src/navigation/nav_data.h:142-158, nav.c:655-693,
    a_star.c:212-258). Batched over K chunks; labels are chunk-local
    (each batch element is independent)."""
    eff = jnp.where(blockers > 0, jnp.uint8(COST_IMPASSABLE),
                    cost.astype(jnp.uint8))
    return label_islands(eff, max_iters=512)
