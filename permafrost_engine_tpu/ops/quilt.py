"""Image quilting (Efros-Freeman) for terrain texture variation.

The reference synthesizes terrain texture variation with 65-px quilt
blocks and min-error boundary cuts on the CPU (ref: src/render/
gl_image_quilt.c). The TPU formulation: candidate-block matching is one
batched SSD reduction over all candidate blocks at once ([C, B, B, 3]
tensors on the VPU), and the min-error seam is a short dynamic program
(lax.scan over B rows, vectorized across the overlap width). Blocks are
placed in raster order (inherently sequential), so synthesis runs as a
host loop of device steps — a load-time tool, not a tick-path kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _candidate_blocks(src: np.ndarray, block: int, stride: int) -> np.ndarray:
    h, w = src.shape[:2]
    out = []
    for r in range(0, h - block + 1, stride):
        for c in range(0, w - block + 1, stride):
            out.append(src[r:r + block, c:c + block])
    return np.stack(out)


@functools.partial(jax.jit, static_argnames=())
def _block_ssd(cands: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """SSD of every candidate against the already-placed pixels.
    cands [C,B,B,3], target [B,B,3], mask [B,B] (1 where placed)."""
    d = (cands - target[None]) ** 2
    return jnp.sum(d * mask[None, :, :, None], axis=(1, 2, 3))


@functools.partial(jax.jit, static_argnames=())
def _vertical_seam(err: jax.Array) -> jax.Array:
    """Min-cost top-to-bottom seam through err [B, O]; returns column index
    per row (the min-error boundary cut)."""
    b, o = err.shape

    def down(carry, row_err):
        prev = carry                       # [O] best cost to previous row
        left = jnp.concatenate([jnp.full((1,), jnp.inf), prev[:-1]])
        right = jnp.concatenate([prev[1:], jnp.full((1,), jnp.inf)])
        best = jnp.minimum(prev, jnp.minimum(left, right))
        cost = row_err + best
        return cost, cost

    _, costs = jax.lax.scan(down, err[0], err[1:])
    costs = jnp.concatenate([err[:1], costs], axis=0)   # [B, O]

    # backtrack: start at the min of the last row, walk up within +-1
    def up(carry, row_cost):
        col = carry
        lo = jnp.maximum(col - 1, 0)
        window = jnp.stack([row_cost[lo],
                            row_cost[jnp.minimum(lo + 1, o - 1)],
                            row_cost[jnp.minimum(lo + 2, o - 1)]])
        # forbid out-of-range picks at the edges
        window = jnp.where(
            jnp.arange(3) + lo > jnp.minimum(col + 1, o - 1), jnp.inf, window)
        col = lo + jnp.argmin(window)
        return col, col

    start = jnp.argmin(costs[-1])
    _, cols = jax.lax.scan(up, start, costs[:-1][::-1])
    return jnp.concatenate([cols[::-1], start[None]])


def image_quilt(
    src: np.ndarray,
    out_h: int,
    out_w: int,
    *,
    block: int = 64,
    overlap: int = 10,
    stride: int = 8,
    tolerance: float = 1.15,
    seed: int = 0,
) -> np.ndarray:
    """Synthesize an [out_h, out_w, 3] texture from src (f32 in [0,1])."""
    rng = np.random.default_rng(seed)
    cands = jnp.asarray(_candidate_blocks(src.astype(np.float32), block, stride))
    step = block - overlap
    rows = -(-max(out_h - block, 0) // step) + 1
    cols = -(-max(out_w - block, 0) // step) + 1
    oh = (rows - 1) * step + block
    ow = (cols - 1) * step + block
    out = np.zeros((oh, ow, 3), np.float32)
    placed = np.zeros((oh, ow), np.float32)

    for br in range(rows):
        for bc in range(cols):
            r0, c0 = br * step, bc * step
            target = jnp.asarray(out[r0:r0 + block, c0:c0 + block])
            mask = jnp.asarray(placed[r0:r0 + block, c0:c0 + block])
            if br == 0 and bc == 0:
                pick = int(rng.integers(len(cands)))
            else:
                ssd = np.asarray(_block_ssd(cands, target, mask))
                lim = ssd.min() * tolerance + 1e-6
                pool = np.nonzero(ssd <= lim)[0]
                pick = int(rng.choice(pool))
            cand = np.asarray(cands[pick])

            blend = np.ones((block, block), np.float32)
            if bc > 0:   # left overlap: vertical seam
                err = np.asarray(jnp.sum(
                    (jnp.asarray(cand[:, :overlap])
                     - target[:, :overlap]) ** 2, axis=-1))
                seam = np.asarray(_vertical_seam(jnp.asarray(err)))
                cols_idx = np.arange(overlap)[None, :]
                blend[:, :overlap] = (cols_idx >= seam[:, None]).astype(np.float32)
            if br > 0:   # top overlap: horizontal seam (transpose trick)
                err = np.asarray(jnp.sum(
                    (jnp.asarray(cand[:overlap, :])
                     - target[:overlap, :]) ** 2, axis=-1)).T
                seam = np.asarray(_vertical_seam(jnp.asarray(err)))  # [B] per col
                rows_idx = np.arange(overlap)[:, None]
                blend[:overlap, :] *= (rows_idx >= seam[None, :]).astype(np.float32)

            region = out[r0:r0 + block, c0:c0 + block]
            m3 = blend[..., None]
            out[r0:r0 + block, c0:c0 + block] = cand * m3 + region * (1 - m3)
            placed[r0:r0 + block, c0:c0 + block] = 1.0

    return out[:out_h, :out_w]
