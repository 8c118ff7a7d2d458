"""Optimal entity->formation-cell assignment via the auction algorithm.

The reference solves formation reshuffling with the O(n^3) Hungarian
algorithm on cover/star/prime matrices (ref: src/game/formation.c:
1617-2050). Hungarian is irreducibly serial; the auction algorithm
(Bertsekas) reaches an assignment within n*eps of optimal through rounds
of *parallel bidding* — every unassigned bidder computes its best and
second-best value over all objects simultaneously, one [N, M] tensor op
per round. That makes it the TPU-native choice: the whole inner loop is
VPU work over the cost matrix, and eps trades rounds for exactness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1e18


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def auction_assign(
    cost: jax.Array,           # f32[N, M] cost of bidder i taking object j
    bidder_mask: jax.Array,    # bool[N] real bidders
    object_mask: jax.Array,    # bool[M] real objects (need M >= N actives)
    *,
    eps: float | None = None,
    max_rounds: int = 10000,
) -> jax.Array:
    """Jacobi parallel auction. Returns i32[N]: object per bidder, -1 for
    masked bidders. Total cost is within (num_bidders * eps) of optimal."""
    n, m = cost.shape
    idx_n = jnp.arange(n, dtype=jnp.int32)
    valid = bidder_mask[:, None] & object_mask[None, :]
    value = jnp.where(valid, -cost.astype(jnp.float32), -BIG)

    if eps is None:
        fin = jnp.where(valid, cost, 0.0)
        spread = jnp.max(fin) - jnp.min(fin)
        eps_v = jnp.maximum(spread, 1e-3) / (2.0 * max(n, 1) * max(n, 1))
    else:
        eps_v = jnp.asarray(eps, jnp.float32)

    def cond(carry):
        it, price, owner, assign = carry
        return (it < max_rounds) & jnp.any(bidder_mask & (assign < 0))

    def body(carry):
        it, price, owner, assign = carry
        unassigned = bidder_mask & (assign < 0)

        # ---- bid phase: best + second-best net value per bidder -----------
        net = jnp.where(object_mask[None, :], value - price[None, :], -BIG)
        best_j = jnp.argmax(net, axis=1).astype(jnp.int32)
        best_v = jnp.max(net, axis=1)
        net2 = net.at[idx_n, best_j].set(-BIG)
        second_v = jnp.max(net2, axis=1)
        bid = price[best_j] + (best_v - second_v) + eps_v
        tgt = jnp.where(unassigned, best_j, m)             # m = dropped

        # ---- resolve phase: per object, max bid then min bidder index -----
        bid_obj = jnp.full((m,), -BIG).at[tgt].max(bid, mode="drop")
        is_max = unassigned & (bid >= bid_obj[jnp.clip(best_j, 0, m - 1)])
        tgt_max = jnp.where(is_max, best_j, m)
        winner_obj = jnp.full((m,), n, jnp.int32).at[tgt_max].min(
            idx_n, mode="drop")
        has_bid = winner_obj < n

        # ---- update: evict old owners, install winners, raise prices ------
        evict_src = jnp.where(has_bid & (owner >= 0), owner, n)
        evicted = jnp.zeros((n,), jnp.bool_).at[evict_src].set(
            True, mode="drop")
        assign = jnp.where(evicted, -1, assign)
        won = is_max & (winner_obj[jnp.clip(best_j, 0, m - 1)] == idx_n)
        assign = jnp.where(won, best_j, assign)
        owner = jnp.where(has_bid, winner_obj, owner)
        price = jnp.where(has_bid, bid_obj, price)

        return it + 1, price, owner, assign

    init = (
        jnp.array(0, jnp.int32),
        jnp.zeros((m,), jnp.float32),
        jnp.full((m,), -1, jnp.int32),
        jnp.full((n,), -1, jnp.int32),
    )
    _, _, _, assign = jax.lax.while_loop(cond, body, init)
    return jnp.where(bidder_mask, assign, -1)
