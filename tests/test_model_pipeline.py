"""Model pipeline tests: pfobj writer round-trip, OBJ import, QEM LODs.

Native analogues of the reference's Blender export addon and LOD passes
(ref: /root/reference/tools/blender_addon, tools/lod_generation)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")

from permafrost_engine_tpu.assets.pfobj import parse_pfobj, write_pfobj


def _sphere_obj(nlat: int = 12, nlon: int = 18, r: float = 2.0) -> str:
    """UV-sphere Wavefront OBJ (quads as n-gons to exercise fan split)."""
    lines = ["# test sphere", "usemtl shell"]
    for i in range(nlat + 1):
        th = np.pi * i / nlat
        for j in range(nlon):
            ph = 2 * np.pi * j / nlon
            lines.append(
                f"v {r * np.sin(th) * np.cos(ph):.6f} {r * np.cos(th):.6f} "
                f"{r * np.sin(th) * np.sin(ph):.6f}")

    def vid(i, j):
        return i * nlon + (j % nlon) + 1

    for i in range(nlat):
        for j in range(nlon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j + 1), vid(i + 1, j)
            lines.append(f"f {a} {b} {c} {d}")
    return "\n".join(lines)


def test_obj_convert_and_writer_roundtrip():
    from model_pipeline import obj_to_pfobj
    m = obj_to_pfobj(_sphere_obj())
    assert len(m.verts) % 3 == 0 and len(m.verts) > 100
    assert m.materials[0].name == "shell"
    # all on the sphere
    rr = np.linalg.norm(m.verts, axis=1)
    pole = rr < 1e-6           # degenerate pole corners excluded
    assert np.allclose(rr[~pole], 2.0, atol=1e-4)
    # normals point outward-ish (degenerate pole tris have zero normals)
    ok = (rr > 1e-3) & (np.linalg.norm(m.normals, axis=1) > 1e-6)
    dots = np.einsum("ij,ij->i", m.normals[ok], m.verts[ok] / rr[ok, None])
    assert (dots > 0).mean() > 0.95

    back = parse_pfobj(write_pfobj(m))
    np.testing.assert_allclose(back.verts, m.verts, atol=1e-5)
    np.testing.assert_allclose(back.uvs, m.uvs, atol=1e-5)
    np.testing.assert_array_equal(back.vert_mat, m.vert_mat)
    assert back.materials[0].name == "shell"


def test_writer_roundtrip_with_joints_and_clips():
    from permafrost_engine_tpu.assets.pfobj import AnimClip, Material, PFObj
    j, frames, v = 3, 4, 6
    rng = np.random.default_rng(0)
    rots = rng.normal(size=(frames, j, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)
    clip = AnimClip("walk", frames,
                    rng.normal(size=(frames, j, 3)).astype(np.float32),
                    rots, np.ones((frames, j, 3), np.float32),
                    bboxes=rng.normal(size=(frames, 2, 3)).astype(np.float32))
    bind_rots = rng.normal(size=(j, 4)).astype(np.float32)
    bind_rots /= np.linalg.norm(bind_rots, axis=-1, keepdims=True)
    m = PFObj(
        verts=rng.normal(size=(v, 3)).astype(np.float32),
        uvs=rng.random((v, 2)).astype(np.float32),
        normals=rng.normal(size=(v, 3)).astype(np.float32),
        weight_joints=rng.integers(0, j, (v, 4)).astype(np.int32),
        weight_vals=rng.random((v, 4)).astype(np.float32),
        vert_mat=np.zeros(v, np.int32),
        materials=[Material("skin", 0.5, (1, 0, 0), (0, 0, 1), "skin.png")],
        joint_parents=np.array([-1, 0, 1], np.int32),
        joint_names=["root", "mid", "tip"],
        bind_trans=rng.normal(size=(j, 3)).astype(np.float32),
        bind_rots=bind_rots,
        bind_scales=np.ones((j, 3), np.float32),
        clips={"walk": clip}, bbox=None)
    back = parse_pfobj(write_pfobj(m))
    np.testing.assert_allclose(back.verts, m.verts, atol=1e-5)
    np.testing.assert_array_equal(back.joint_parents, m.joint_parents)
    np.testing.assert_allclose(back.bind_trans, m.bind_trans, atol=1e-4)
    # quaternions match up to sign
    for a, b in zip(back.bind_rots, m.bind_rots):
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-4
    wb = back.clips["walk"]
    np.testing.assert_allclose(wb.trans, clip.trans, atol=1e-4)
    np.testing.assert_allclose(wb.bboxes, clip.bboxes, atol=1e-4)
    for f in range(frames):
        for jj in range(j):
            a, b = wb.rots[f, jj], clip.rots[f, jj]
            assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 1e-4


def test_qem_decimation_preserves_shape():
    from model_pipeline import decimate, obj_to_pfobj
    m = obj_to_pfobj(_sphere_obj(14, 20))
    n_tris = len(m.verts) // 3
    for ratio in (0.5, 0.25):
        soup, src = decimate(m.verts, ratio)
        out_tris = len(soup) // 3
        assert out_tris <= int(n_tris * ratio) + 2
        assert out_tris >= int(n_tris * ratio * 0.5)
        # surviving surface stays on the sphere (QEM keeps shape)
        rr = np.linalg.norm(soup, axis=1)
        assert np.abs(rr - 2.0).max() < 0.15
        # attribute carry: valid source-corner indices
        assert src.shape == (len(soup),)
        assert (src >= 0).all() and (src < len(m.verts)).all()


def test_lod_cli(tmp_path):
    import subprocess
    obj = tmp_path / "s.obj"
    obj.write_text(_sphere_obj())
    pfobj = tmp_path / "s.pfobj"
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/model_pipeline.py", "convert",
         str(obj), str(pfobj)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/model_pipeline.py", "lods",
         str(pfobj)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lod1 = parse_pfobj((tmp_path / "s.lod1.pfobj").read_text())
    lod2 = parse_pfobj((tmp_path / "s.lod2.pfobj").read_text())
    base = parse_pfobj(pfobj.read_text())
    assert len(lod1.verts) < len(base.verts)
    assert len(lod2.verts) < len(lod1.verts)
