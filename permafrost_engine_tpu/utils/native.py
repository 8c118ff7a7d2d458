"""ctypes bindings for the native host-runtime library (native/pf_native.cpp).

Auto-builds on first import if the shared object is missing (g++ is part of
the toolchain); every entry point has a pure-Python fallback, so the
library is an accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "libpf_native.so")

_lib = None


def lib() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["sh", os.path.join(_REPO, "native", "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        _lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C")

    _lib.parse_pfmap_tiles.restype = ctypes.c_int64
    _lib.parse_pfmap_tiles.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        u8p, i8p, u8p, i16p, i16p, u8p, u8p, u8p, u8p, u8p]

    _lib.astar_portals.restype = ctypes.c_int64
    _lib.astar_portals.argtypes = [
        ctypes.c_int64, i64p, i64p, f32p, f32p, f32p,
        i64p, f32p, ctypes.c_int64,
        i64p, f32p, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, i64p, ctypes.c_int64]

    _lib.grid_dijkstra.restype = None
    _lib.grid_dijkstra.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_int64, f32p]
    return _lib


def parse_tiles(tile_text: str, n_tiles: int):
    """Fast tile-record parsing; returns dict of arrays or None if the
    native lib is unavailable."""
    L = lib()
    if L is None:
        return None
    out = {
        "tile_type": np.zeros(n_tiles, np.uint8),
        "base_height": np.zeros(n_tiles, np.int8),
        "ramp_height": np.zeros(n_tiles, np.uint8),
        "top_mat": np.zeros(n_tiles, np.int16),
        "side_mat": np.zeros(n_tiles, np.int16),
        "pathable": np.zeros(n_tiles, np.uint8),
        "blend_normals": np.zeros(n_tiles, np.uint8),
        "no_bump": np.zeros(n_tiles, np.uint8),
        "cover": np.zeros(n_tiles, np.uint8),
        "edge_blend": np.zeros(n_tiles * 4, np.uint8),
    }
    data = tile_text.encode()
    n = L.parse_pfmap_tiles(
        data, len(data), n_tiles,
        out["tile_type"], out["base_height"], out["ramp_height"],
        out["top_mat"], out["side_mat"], out["pathable"],
        out["blend_normals"], out["no_bump"], out["cover"], out["edge_blend"])
    if n != n_tiles:
        return None
    out["pathable"] = out["pathable"].astype(bool)
    out["blend_normals"] = out["blend_normals"].astype(bool)
    out["no_bump"] = out["no_bump"].astype(bool)
    out["edge_blend"] = out["edge_blend"].reshape(n_tiles, 4)
    return out


def astar_csr(adj_off, adj_dst, adj_cost, node_r, node_c,
              start_ids, start_costs, goal_ids, goal_costs, goal_rc):
    """Native A* over a CSR portal graph; returns node path list or None
    (None also when the lib is unavailable — caller falls back)."""
    L = lib()
    if L is None:
        return None
    out = np.zeros(max(16, len(adj_off)), np.int64)
    n = L.astar_portals(
        len(adj_off) - 1,
        np.ascontiguousarray(adj_off, np.int64),
        np.ascontiguousarray(adj_dst, np.int64),
        np.ascontiguousarray(adj_cost, np.float32),
        np.ascontiguousarray(node_r, np.float32),
        np.ascontiguousarray(node_c, np.float32),
        np.ascontiguousarray(start_ids, np.int64),
        np.ascontiguousarray(start_costs, np.float32), len(start_ids),
        np.ascontiguousarray(goal_ids, np.int64),
        np.ascontiguousarray(goal_costs, np.float32), len(goal_ids),
        float(goal_rc[0]), float(goal_rc[1]), out, len(out))
    if n < 0:
        return "unreachable"
    return [int(x) for x in out[:n]]


def grid_dijkstra(cost: np.ndarray, seeds_flat: np.ndarray) -> np.ndarray | None:
    L = lib()
    if L is None:
        return None
    h, w = cost.shape
    dist = np.zeros(h * w, np.float32)
    L.grid_dijkstra(np.ascontiguousarray(cost, np.uint8), h, w,
                    np.ascontiguousarray(seeds_flat, np.int64),
                    len(seeds_flat), dist)
    return dist.reshape(h, w)
