"""Model asset pipeline: OBJ -> PFOBJ conversion + native LOD generation.

The reference ships a Blender export addon (pfobj writer,
/root/reference/tools/blender_addon) and Blender-driven LOD passes
(/root/reference/tools/lod_generation: quadric-bounded optimization, then
.lod1/.lod2 at 50%/25% via COLLAPSE decimation). This environment has no
Blender, so both are re-implemented natively:

  convert  — Wavefront OBJ (v/vt/vn/f, n-gons triangulated) -> .pfobj
             triangle soup (rigid model, materials from usemtl names)
  lods     — quadric-error-metric edge collapse (Garland-Heckbert '97)
             on the welded mesh, normal-flip guarded; writes
             <name>.lod1.pfobj (50%) and <name>.lod2.pfobj (25%),
             carrying uv/weight/material attributes through collapses

Usage:
  python tools/model_pipeline.py convert model.obj model.pfobj
  python tools/model_pipeline.py lods model.pfobj [--ratios 0.5 0.25]
"""

from __future__ import annotations

import argparse
import heapq
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from permafrost_engine_tpu.assets.pfobj import (  # noqa: E402
    Material, PFObj, parse_pfobj, write_pfobj,
)


# ---------------------------------------------------------------------------
# OBJ -> PFObj
# ---------------------------------------------------------------------------


def obj_to_pfobj(text: str) -> PFObj:
    """Parse Wavefront OBJ into a rigid PFObj (triangle soup)."""
    vs, vts, vns = [], [], []
    corners: list[tuple] = []           # (vi, ti, ni, mat)
    mats: list[str] = []
    cur_mat = 0
    for ln in text.splitlines():
        p = ln.split()
        if not p or p[0].startswith("#"):
            continue
        if p[0] == "v":
            vs.append([float(x) for x in p[1:4]])
        elif p[0] == "vt":
            vts.append([float(x) for x in p[1:3]])
        elif p[0] == "vn":
            vns.append([float(x) for x in p[1:4]])
        elif p[0] == "usemtl":
            if p[1] not in mats:
                mats.append(p[1])
            cur_mat = mats.index(p[1])
        elif p[0] == "f":
            refs = []
            for tok in p[1:]:
                parts = (tok.split("/") + ["", ""])[:3]
                vi = int(parts[0]) - 1
                ti = int(parts[1]) - 1 if parts[1] else -1
                ni = int(parts[2]) - 1 if parts[2] else -1
                refs.append((vi, ti, ni))
            for k in range(1, len(refs) - 1):   # fan-triangulate n-gons
                for r in (refs[0], refs[k], refs[k + 1]):
                    corners.append((*r, cur_mat))
    if not corners:
        raise ValueError("no faces in OBJ")
    n = len(corners)
    verts = np.zeros((n, 3), np.float32)
    uvs = np.zeros((n, 2), np.float32)
    normals = np.zeros((n, 3), np.float32)
    vmat = np.zeros(n, np.int32)
    for i, (vi, ti, ni, mi) in enumerate(corners):
        verts[i] = vs[vi]
        if ti >= 0:
            uvs[i] = vts[ti]
        if ni >= 0:
            normals[i] = vns[ni]
        vmat[i] = mi
    # flat normals where the OBJ has none
    miss = np.linalg.norm(normals, axis=1) < 1e-6
    if miss.any():
        tri = verts.reshape(-1, 3, 3)
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-9)
        flat = np.repeat(fn, 3, axis=0)
        normals[miss] = flat[miss]
    materials = [Material(m, 1.0, (0.8, 0.8, 0.8), (0.1, 0.1, 0.1), "")
                 for m in (mats or ["default"])]
    return PFObj(
        verts=verts, uvs=uvs, normals=normals,
        weight_joints=np.full((n, 4), -1, np.int32),
        weight_vals=np.zeros((n, 4), np.float32),
        vert_mat=vmat, materials=materials,
        joint_parents=np.zeros(0, np.int32), joint_names=[],
        bind_trans=np.zeros((0, 3), np.float32),
        bind_rots=np.zeros((0, 4), np.float32),
        bind_scales=np.ones((0, 3), np.float32),
        clips={}, bbox=np.stack([verts.min(0), verts.max(0)]))


# ---------------------------------------------------------------------------
# Quadric-error-metric decimation (Garland-Heckbert)
# ---------------------------------------------------------------------------


def _weld(soup: np.ndarray, eps: float = 1e-5):
    """Triangle soup [3n, 3] -> (verts [V,3], faces [F,3], corner->vert)."""
    key = np.round(soup / eps).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True,
                              return_inverse=True)
    verts = soup[first]
    faces = inv.reshape(-1, 3)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    return verts.astype(np.float64), faces[ok], inv


def _face_quadrics(verts, faces):
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(b - a, c - a)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    d = -np.einsum("fi,fi->f", n, a)
    p = np.concatenate([n, d[:, None]], 1)              # [F,4]
    return np.einsum("fi,fj->fij", p, p)                # [F,4,4]


def decimate(soup: np.ndarray, target_ratio: float):
    """Collapse edges until only target_ratio of the faces remain.

    soup f32[3n, 3] (triangle order). Returns (new_soup f32[3m, 3],
    corner_src i64[3m]) where corner_src maps each output corner to an
    input corner whose attributes it should carry."""
    verts, faces, inv = _weld(soup)
    v_n, f_n = len(verts), len(faces)
    target_f = max(4, int(f_n * target_ratio))

    kf = _face_quadrics(verts, faces)
    quad = np.zeros((v_n, 4, 4))
    for k in range(3):
        np.add.at(quad, faces[:, k], kf)

    # representative input corner per welded vertex (attribute carrier)
    rep_corner = np.zeros(v_n, np.int64)
    rep_corner[inv] = np.arange(len(inv))

    parent = np.arange(v_n)

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    # adjacency: vertex -> set of face ids
    vfaces = [set() for _ in range(v_n)]
    for fi, f in enumerate(faces):
        for u in f:
            vfaces[u].add(fi)
    face_alive = np.ones(f_n, bool)
    faces = faces.copy()

    version = np.zeros(v_n, np.int64)

    def edge_cost(u, v):
        q = quad[u] + quad[v]
        a = q.copy()
        a[3] = [0, 0, 0, 1]
        try:
            x = np.linalg.solve(a, [0, 0, 0, 1.0])
        except np.linalg.LinAlgError:
            x = np.append((verts[u] + verts[v]) / 2, 1.0)
        return float(x @ q @ x), x[:3]

    def push_edges_of(u, heap):
        nbrs = set()
        for fi in vfaces[u]:
            if face_alive[fi]:
                nbrs.update(int(x) for x in faces[fi])
        nbrs.discard(u)
        for v in nbrs:
            c, x = edge_cost(u, v)
            heapq.heappush(heap, (c, u, v, version[u], version[v],
                                  tuple(x)))

    heap: list = []
    edges = set()
    for f in faces:
        for (u, v) in ((f[0], f[1]), (f[1], f[2]), (f[0], f[2])):
            e = (min(u, v), max(u, v))
            if e not in edges:
                edges.add(e)
                c, x = edge_cost(e[0], e[1])
                heapq.heappush(heap, (c, e[0], e[1], version[e[0]],
                                      version[e[1]], tuple(x)))

    alive_faces = int(face_alive.sum())
    while alive_faces > target_f and heap:
        c, u, v, vu, vv, x = heapq.heappop(heap)
        if parent[u] != u or parent[v] != v:
            continue
        if version[u] != vu or version[v] != vv:
            continue
        x = np.asarray(x)
        # normal-flip guard: collapsing must not invert surviving faces
        shared = vfaces[u] & vfaces[v]
        flip = False
        for fi in (vfaces[u] | vfaces[v]) - shared:
            if not face_alive[fi]:
                continue
            f = faces[fi]
            p = verts[f].copy()
            n0 = np.cross(p[1] - p[0], p[2] - p[0])
            p[np.nonzero((f == u) | (f == v))[0]] = x
            n1 = np.cross(p[1] - p[0], p[2] - p[0])
            if n0 @ n1 < 0:
                flip = True
                break
        if flip:
            continue

        # collapse v into u at x
        parent[v] = u
        verts[u] = x
        quad[u] = quad[u] + quad[v]
        version[u] += 1
        for fi in shared:
            if face_alive[fi]:
                face_alive[fi] = False
                alive_faces -= 1
        for fi in vfaces[v]:
            if face_alive[fi]:
                faces[fi][faces[fi] == v] = u
                f = faces[fi]
                if f[0] == f[1] or f[1] == f[2] or f[0] == f[2]:
                    face_alive[fi] = False
                    alive_faces -= 1
                else:
                    vfaces[u].add(fi)
        push_edges_of(u, heap)

    out_faces = faces[face_alive]
    new_soup = verts[out_faces.reshape(-1)].astype(np.float32)
    corner_src = rep_corner[out_faces.reshape(-1)]
    return new_soup, corner_src


def decimate_pfobj(m: PFObj, ratio: float) -> PFObj:
    """LOD variant of a model: decimated soup, attributes carried from the
    nearest surviving source corners; materials/joints/anims kept verbatim
    (ref: lod_generation_pass.py keeps the tail unchanged)."""
    soup, src = decimate(np.asarray(m.verts, np.float32), ratio)
    return PFObj(
        verts=soup, uvs=m.uvs[src], normals=m.normals[src],
        weight_joints=m.weight_joints[src], weight_vals=m.weight_vals[src],
        vert_mat=m.vert_mat[src], materials=list(m.materials),
        joint_parents=m.joint_parents, joint_names=list(m.joint_names),
        bind_trans=m.bind_trans, bind_rots=m.bind_rots,
        bind_scales=m.bind_scales, clips=dict(m.clips), bbox=m.bbox)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert")
    c.add_argument("obj")
    c.add_argument("pfobj")
    l = sub.add_parser("lods")
    l.add_argument("pfobj")
    l.add_argument("--ratios", type=float, nargs="+", default=[0.5, 0.25])
    args = ap.parse_args()

    if args.cmd == "convert":
        with open(args.obj) as f:
            m = obj_to_pfobj(f.read())
        with open(args.pfobj, "w") as f:
            f.write(write_pfobj(m))
        print(f"wrote {args.pfobj}: {len(m.verts) // 3} tris, "
              f"{len(m.materials)} materials")
    else:
        with open(args.pfobj) as f:
            m = parse_pfobj(f.read())
        base = args.pfobj[:-len(".pfobj")]
        for i, r in enumerate(args.ratios, start=1):
            lod = decimate_pfobj(m, r)
            path = f"{base}.lod{i}.pfobj"
            with open(path, "w") as f:
                f.write(write_pfobj(lod))
            print(f"wrote {path}: {len(m.verts) // 3} -> "
                  f"{len(lod.verts) // 3} tris")


if __name__ == "__main__":
    main()
