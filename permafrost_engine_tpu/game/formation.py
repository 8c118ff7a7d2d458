"""Formations: cell layout, terrain-aware placement, optimal assignment.

The reference arranges units into RANK/COLUMN formations of terrain-checked
cells and solves the entity->cell assignment with the Hungarian algorithm
(ref: src/game/formation.c:450-980 cell placement, 1991-2050 assignment;
types in src/game/public/game.h:120-125). Here cell layout + terrain checks
are cheap host numpy (event-rate work), and the assignment runs on device
via the parallel auction solver (ops/assignment.py).

Per-cell arrival flow fields (formation.c:354) are approximated by the
flock's shared goal fields + exact per-entity cell destinations; the
movement substep's arrive steering handles the final approach.
"""

from __future__ import annotations

from enum import IntEnum

import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import COST_IMPASSABLE, NAV_TILE_SIZE
from permafrost_engine_tpu.ops.assignment import auction_assign


class FormationType(IntEnum):
    NONE = 0
    RANK = 1
    COLUMN = 2


def layout_cells(
    n: int,
    goal: np.ndarray,          # (2,) world
    direction: np.ndarray,     # (2,) facing (from units toward goal)
    ftype: FormationType,
    spacing: float,
    cost_layer: np.ndarray,    # u8[H, W] for pathability checks
    max_extra_rows: int = 16,
) -> np.ndarray:
    """Compute >= n pathable cell positions around `goal`, oriented so RANK
    formations face `direction`. Returns f32[M, 2], M >= n (or all found)."""
    d = direction / max(np.linalg.norm(direction), 1e-6)
    right = np.array([-d[1], d[0]])

    if ftype == FormationType.COLUMN:
        cols = max(1, int(np.ceil(np.sqrt(n / 4))))
    else:  # RANK (and NONE fallback): wide front
        cols = max(1, int(np.ceil(np.sqrt(n * 4))))

    cells = []
    h, w = cost_layer.shape
    row = 0
    while len(cells) < n and row < (n // cols + 1) + max_extra_rows:
        for col in range(cols):
            off_r = (col - (cols - 1) / 2.0) * spacing
            off_d = -row * spacing
            p = goal + right * off_r + d * off_d
            r_t = int(p[1] // NAV_TILE_SIZE)
            c_t = int(p[0] // NAV_TILE_SIZE)
            if 0 <= r_t < h and 0 <= c_t < w and cost_layer[r_t, c_t] != COST_IMPASSABLE:
                cells.append(p)
        row += 1
    return np.asarray(cells, np.float32).reshape(-1, 2)


def assign_cells(units_pos: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Optimal-ish unit->cell mapping by squared distance (device auction).
    Returns i32[n] cell index per unit."""
    n, m = len(units_pos), len(cells)
    diff = units_pos[:, None, :] - cells[None, :, :]
    cost = (diff ** 2).sum(-1).astype(np.float32)
    assign = np.asarray(auction_assign(
        jnp.asarray(cost),
        jnp.ones(n, bool),
        jnp.ones(m, bool),
    ))
    # fallback for any unassigned stragglers (auction round cap): greedy
    unfilled = np.nonzero(assign < 0)[0]
    if unfilled.size:
        taken = set(int(a) for a in assign if a >= 0)
        for i in unfilled:
            order = np.argsort(cost[i])
            for j in order:
                if int(j) not in taken:
                    assign[i] = j
                    taken.add(int(j))
                    break
    return assign
