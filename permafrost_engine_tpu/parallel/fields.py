"""Chunk-row-sharded flow-field integration with ICI halo exchange.

Per-chunk fields are embarrassingly parallel (each 64x64 chunk is an
independent integration), but whole-map fields (enemy-seek/surround over
[H, W]) grow with map size. This shards the map's rows across the mesh and
runs the min-plus relaxation under `shard_map`: each device relaxes its
row band and exchanges one-row halos with its neighbours over ICI via
`jax.lax.ppermute` every iteration — the neighbour-only communication
structure SURVEY §2.9 maps ring/context-parallel techniques onto.

Convergence is a `psum`-reduced changed-flag so every device exits the
while_loop on the same iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from permafrost_engine_tpu.core.config import COST_IMPASSABLE, INF_COST
from permafrost_engine_tpu.ops.flowfield import (
    _neighbour_allowed_masks,
    _relax_once,
)

AXIS = "rows"


def make_sharded_integrate(mesh: Mesh, h: int, w: int, *,
                           max_iters: int | None = None,
                           check_every: int = 8, axis: str = AXIS):
    """Build integrate(cost u8[H, W], seeds bool[H, W]) -> f32[H, W]
    row-sharded over `mesh` (1-D). `axis` names the mesh axis to shard
    rows over (the engine's mesh calls it "ents")."""
    n_dev = mesh.devices.size
    assert h % n_dev == 0, f"rows {h} must divide over {n_dev} devices"
    max_iters = max_iters or 4 * max(h, w)

    def local_integrate(cost, seeds):
        """Runs per device on its [h/n, w] band."""
        idx = jax.lax.axis_index(axis)
        up = (idx - 1) % n_dev
        down = (idx + 1) % n_dev
        first = idx == 0
        last = idx == n_dev - 1

        passable = cost != COST_IMPASSABLE
        step_cost = jnp.where(passable, cost.astype(jnp.float32), INF_COST)
        integ0 = jnp.where(seeds & passable, 0.0, INF_COST)

        def with_halo(x, fill):
            """Pad the band with neighbour boundary rows (map edges: fill).

            ppermute moves our top row to the device above and our bottom
            row to the device below, so each device receives its
            neighbours' adjacent rows."""
            top_from_below = jax.lax.ppermute(
                x[:1], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)])
            bot_from_above = jax.lax.ppermute(
                x[-1:], axis, [(i, (i + 1) % n_dev) for i in range(n_dev)])
            top = jnp.where(first, fill, bot_from_above)
            bot = jnp.where(last, fill, top_from_below)
            return jnp.concatenate([top, x, bot], axis=0)

        def relax_with_halo(integ):
            gi = with_halo(integ, jnp.full((1, w), INF_COST))
            gp = with_halo(passable, jnp.zeros((1, w), jnp.bool_))
            gs = jnp.concatenate(
                [jnp.full((1, w), INF_COST), step_cost,
                 jnp.full((1, w), INF_COST)], axis=0)
            allowed = _neighbour_allowed_masks(gp)
            out = _relax_once(gi, gs, gp, allowed)
            return out[1:-1]

        def cond(carry):
            i, integ, done = carry
            return (~done) & (i < max_iters)

        def body(carry):
            i, integ, _ = carry
            new = jax.lax.fori_loop(
                0, check_every, lambda _, x: relax_with_halo(x), integ)
            local_done = jnp.all(new == integ)
            done = jax.lax.pmin(local_done.astype(jnp.int32), axis) > 0
            return i + check_every, new, done

        _, integ, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), integ0, jnp.bool_(False)))
        return jnp.where(seeds & passable, 0.0, integ)

    fn = shard_map(
        local_integrate, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    return jax.jit(fn)
