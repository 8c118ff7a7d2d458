"""Rasterizer + scene renderer tests.

The raster kernel is oracle-tested pixel-for-pixel against a brute-force
NumPy rasterizer (every triangle vs every pixel, z-buffered) — the same
role the GL driver's reference rasterizer plays for the C engine's
shaders (ref: /root/reference/shaders/)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from permafrost_engine_tpu.render import raster
from permafrost_engine_tpu.render.raster import (
    _edge, project, raster_gbuffer, shade_gbuffer,
)


def _oracle(xy, z, valid, h, w):
    zbuf = np.full((h, w), np.inf, np.float32)
    tri = np.full((h, w), -1, np.int32)
    px, py = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    for t in range(len(xy)):
        if not valid[t]:
            continue
        a, b, c = xy[t]
        ar = (c[0] - a[0]) * (b[1] - a[1]) - (c[1] - a[1]) * (b[0] - a[0])
        if ar <= 1e-9:
            continue
        e0 = (px - b[0]) * (c[1] - b[1]) - (py - b[1]) * (c[0] - b[0])
        e1 = (px - c[0]) * (a[1] - c[1]) - (py - c[1]) * (a[0] - c[0])
        e2 = (px - a[0]) * (b[1] - a[1]) - (py - a[1]) * (b[0] - a[0])
        ins = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        zp = (e0 * z[t, 0] + e1 * z[t, 1] + e2 * z[t, 2]) / ar
        upd = ins & (zp < zbuf)
        zbuf[upd] = zp[upd]
        tri[upd] = t
    return zbuf, tri


def test_raster_matches_bruteforce_oracle():
    rng = np.random.default_rng(0)
    h = w = 64
    t_n = 200
    xy = rng.uniform(-10, 74, (t_n, 3, 2)).astype(np.float32)
    z = rng.uniform(-0.9, 0.9, (t_n, 3)).astype(np.float32)
    valid = rng.random(t_n) < 0.9
    xy[:5] = rng.uniform(-20, 90, (5, 3, 2))      # oversized -> brute path

    area = np.asarray(_edge(jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]),
                            jnp.asarray(xy[:, 2])))
    flip = area < 0
    xy[flip] = xy[flip][:, ::-1]
    z[flip] = z[flip][:, ::-1]
    valid &= np.abs(area) > 1e-6

    zbuf, tri, bary = raster_gbuffer(jnp.asarray(xy), jnp.asarray(z),
                                     jnp.asarray(valid), h=h, w=w)
    ozbuf, otri = _oracle(xy, z, valid, h, w)
    assert (np.asarray(tri) == otri).all()
    both = np.isfinite(ozbuf)
    assert np.allclose(np.asarray(zbuf)[both], ozbuf[both], atol=1e-5)
    # barycentrics of covered pixels sum to 1
    cov = np.asarray(tri) >= 0
    assert np.allclose(np.asarray(bary)[cov].sum(-1), 1.0, atol=1e-4)


def test_project_rejects_behind_camera_and_normalizes_winding():
    vp = np.eye(4, dtype=np.float32)
    tris = np.array([
        [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]],   # ccw
        [[-0.5, -0.5, 0.0], [0.0, 0.5, 0.0], [0.5, -0.5, 0.0]],   # cw
    ], np.float32)
    xy, z, inv_w, valid, flip = project(jnp.asarray(tris), jnp.asarray(vp),
                                        64, 64)
    assert bool(valid[0]) and bool(valid[1])
    a = np.asarray(_edge(xy[:, 0], xy[:, 1], xy[:, 2]))
    assert (a > 0).all()                           # both now same winding
    # w = 1 for an identity "projection" -> valid; a behind-camera w<0 case:
    vp2 = np.diag([1.0, 1.0, 1.0, -1.0]).astype(np.float32)
    _, _, _, valid2, _ = project(jnp.asarray(tris), jnp.asarray(vp2), 64, 64)
    assert not bool(valid2.any())


def test_perspective_correct_attribute_interpolation():
    # one triangle with vastly different w per vertex: linear-in-screen
    # interpolation would be wrong; perspective-correct matches analytic
    h = w = 32
    # CCW order in the kernel's screen convention (raster_gbuffer expects
    # project()-normalized winding)
    xy = jnp.asarray([[[2.0, 2.0], [2.0, 30.0], [30.0, 2.0]]])
    z = jnp.zeros((1, 3))
    valid = jnp.ones(1, bool)
    zb, tri, bary = raster_gbuffer(xy, z, valid, h=h, w=w, k=16, kbig=16)
    inv_w = jnp.asarray([[1.0, 0.1, 1.0]])         # vertex 1 is 10x farther
    attrs = jnp.zeros((1, 3, 9))
    attrs = attrs.at[0, :, 6].set(jnp.asarray([0.0, 1.0, 0.0]))  # red chan
    col = shade_gbuffer(
        tri, bary, inv_w, attrs, jnp.asarray([0.0, -1.0, 0.0]),
        jnp.full((2, 2), jnp.inf), jnp.eye(4),
        jnp.full((2, 2), 2, jnp.uint8), jnp.asarray([1.0, 1.0]),
        jnp.zeros((2, 3)), jnp.zeros((h, w, 3)))
    col = np.asarray(col)
    tri = np.asarray(tri)
    bary = np.asarray(bary)
    r, c = 10, 16
    assert tri[r, c] == 0
    b = bary[r, c]
    pw = b * np.array([1.0, 0.1, 1.0])
    expect = pw[1] / pw.sum()                      # weight on vertex 1
    # normals are zero -> lambert 0 -> shade floor 0.42 multiplies rgb
    assert abs(col[r, c, 0] - 0.42 * expect) < 1e-3
    # screen-linear would give bary itself — materially different here
    assert abs(b[1] - expect) > 0.1


def _tiny_engine():
    from permafrost_engine_tpu.core.config import (DiplomacyState,
                                                   EngineConfig, EntityFlags)
    from permafrost_engine_tpu.game.engine import Engine
    cfg = EngineConfig(max_ents=64)
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    h, w = cfg.field_h, cfg.field_w
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    heights = 3 + 3 * np.sin(xx / 20) * np.cos(yy / 16)
    heights[(xx - 130) ** 2 + (yy - 60) ** 2 < 400] = -3.0   # lake
    eng.heights = heights.astype(np.float32)
    rng = np.random.default_rng(0)
    eng.spawn_batch(np.stack([rng.uniform(430, 470, 8),
                              rng.uniform(430, 470, 8)], 1).astype(np.float32),
                    faction=0)
    eng.spawn_batch(np.array([[500.0, 450.0]], np.float32), faction=1,
                    flags=int(EntityFlags.BUILDING), radius=8.0,
                    sel_radius=8.0)
    eng.step(2)
    return eng


@pytest.fixture(scope="module")
def scene_setup():
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.scene import SceneRenderer
    eng = _tiny_engine()
    cam = Camera(pos=np.array([450.0, 90.0, 560.0]), pitch=-40.0, yaw=90.0,
                 aspect=1.0)
    r = SceneRenderer(eng, 128, 128, shadow_res=128)
    return eng, cam, r


def test_scene_render_frame(scene_setup):
    eng, cam, r = scene_setup
    img = r.render(cam)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # deterministic
    img2 = r.render(cam)
    assert (img == img2).all()
    # scene has sky at the top and terrain below
    assert img[:4].mean() > 100                    # sky is bright
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 50


def test_scene_units_and_water_visible(scene_setup):
    eng, cam, r = scene_setup
    from permafrost_engine_tpu.render.camera import Camera
    # look straight down at the blue squad from above
    top = Camera(pos=np.array([450.0, 110.0, 452.0]), pitch=-89.0, yaw=90.0,
                 aspect=1.0)
    img = r.render(top)
    # faction-0 blue pawns: some pixels strongly blue vs green terrain
    blue = (img[..., 2].astype(int) - img[..., 1].astype(int)) > 30
    assert blue.sum() >= 8
    # water: aim at the lake (world ~(520, 240))
    wcam = Camera(pos=np.array([520.0, 150.0, 350.0]), pitch=-55.0, yaw=90.0,
                  aspect=1.0)
    img2 = r.render(wcam)
    bluish = ((img2[..., 2].astype(int) - img2[..., 0].astype(int)) > 20)
    assert bluish.mean() > 0.02


def test_scene_shadows_darken_ground():
    """A tall box on flat ground must cast a darker strip along the sun
    direction (ref: gl_shadows.c depth-map pass)."""
    from permafrost_engine_tpu.core.config import EngineConfig, EntityFlags
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.scene import SUN_DIR, SceneRenderer
    cfg = EngineConfig(max_ents=8)
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.spawn_batch(np.array([[450.0, 450.0]], np.float32), faction=0,
                    flags=int(EntityFlags.BUILDING), radius=10.0,
                    sel_radius=10.0)
    eng.step(1)
    cam = Camera(pos=np.array([450.0, 160.0, 452.0]), pitch=-89.0, yaw=90.0,
                 aspect=1.0)
    r_sh = SceneRenderer(eng, 128, 128, shadow_res=256, shadows=True)
    r_no = SceneRenderer(eng, 128, 128, shadow_res=256, shadows=False)
    lum_sh = r_sh.render(cam).astype(int).sum(-1)
    lum_no = r_no.render(cam).astype(int).sum(-1)
    # with shadows on, a contiguous patch of ground darkens markedly;
    # nothing may get brighter
    darker = (lum_no - lum_sh) > 60
    assert darker.sum() > 20
    assert (lum_sh <= lum_no + 1).all()
    _ = SUN_DIR  # (direction itself covered by the raster oracle tests)


def test_fog_pov_darkens_unexplored(scene_setup):
    eng, cam, r = scene_setup
    img_full = r.render(cam)
    img_pov = r.render(cam, faction_pov=1)
    # faction 1 has one building with default vision: most of the map is
    # unexplored -> black terrain; overall the pov frame is darker
    assert img_pov.astype(int).sum() < img_full.astype(int).sum() * 0.9


def test_pf_dump_framebuffer(tmp_path, scene_setup):
    eng, cam, r = scene_setup
    from permafrost_engine_tpu.script import pf
    ctx = pf.context()
    old_eng, old_cams = ctx.engine, list(ctx.cameras)
    old_active = ctx.active_camera
    try:
        ctx.engine = eng
        pf.set_active_camera(cam)
        p = str(tmp_path / "frame.png")
        assert pf.dump_framebuffer(p)
        from permafrost_engine_tpu.utils.image import load_image
        img = load_image(p, 3)
        assert img.shape[2] == 3 and img.size > 0
    finally:
        ctx.engine = old_eng
        ctx.cameras = old_cams
        ctx.active_camera = old_active


def test_skinned_model_renders_and_animates():
    """Entities with a registered PFObj render their real mesh, skinned by
    the pose palettes (ref: gl_anim.c + skinned.glsl over the anim
    texture); advancing the clip visibly moves the mesh."""
    from permafrost_engine_tpu.assets.pfobj import AnimClip, Material, PFObj
    from permafrost_engine_tpu.core.config import EngineConfig
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.scene import SceneRenderer, _box_mesh

    cfg = EngineConfig(max_ents=8)
    eng = Engine(cfg)
    eng.add_faction(0)
    uids = eng.spawn_batch(np.array([[450.0, 450.0]], np.float32), faction=0)

    # 2-joint arm: all verts weighted to joint 1; the clip swings joint 1
    # from upright to 90-degrees sideways
    soup = (_box_mesh().reshape(-1, 3) * np.array([1.0, 3.0, 1.0])).astype(
        np.float32)
    v = len(soup)
    frames = 9
    rots = np.zeros((frames, 2, 4), np.float32)
    rots[:, 0] = [0, 0, 0, 1]
    for f in range(frames):
        half = np.radians(90.0 * f / (frames - 1)) / 2
        rots[f, 1] = [0, 0, np.sin(half), np.cos(half)]   # rot about z
    clip = AnimClip("swing", frames,
                    np.zeros((frames, 2, 3), np.float32), rots,
                    np.ones((frames, 2, 3), np.float32))
    model = PFObj(
        verts=soup, uvs=np.zeros((v, 2), np.float32),
        normals=np.zeros((v, 3), np.float32),
        weight_joints=np.concatenate(
            [np.ones((v, 1), np.int32), np.full((v, 3), -1, np.int32)], 1),
        weight_vals=np.concatenate(
            [np.ones((v, 1), np.float32), np.zeros((v, 3), np.float32)], 1),
        vert_mat=np.zeros(v, np.int32),
        materials=[Material("m", 1.0, (0.8, 0.1, 0.8), (0, 0, 0), "")],
        joint_parents=np.array([-1, 0], np.int32), joint_names=["r", "arm"],
        bind_trans=np.zeros((2, 3), np.float32),
        bind_rots=np.tile(np.array([0, 0, 0, 1], np.float32), (2, 1)),
        bind_scales=np.ones((2, 3), np.float32),
        clips={"swing": clip, "idle": clip}, bbox=None)
    eng.anim.load_model("arm", model)
    eng.anim.register(int(uids[0]), model="arm", idle_clip="swing")

    cam = Camera(pos=np.array([450.0, 10.0, 480.0]), pitch=-10.0, yaw=90.0,
                 aspect=1.0)
    r = SceneRenderer(eng, 128, 128, shadows=False, reflections=False)
    img0 = r.render(cam)
    purple0 = ((img0[..., 0] > 120) & (img0[..., 2] > 120)
               & (img0[..., 1] < 110))
    assert purple0.sum() > 10                      # the mesh is visible

    eng.anim.states[int(uids[0])].t = frames / 24.0 * 0.99  # end of swing
    img1 = r.render(cam)
    purple1 = ((img1[..., 0] > 120) & (img1[..., 2] > 120)
               & (img1[..., 1] < 110))
    assert purple1.sum() > 10
    # the swing moved the silhouette
    assert (purple0 != purple1).sum() > 20


def test_textures_foliage_and_sprites():
    """Terrain detail textures vary pixel luminance within one material;
    foliage blades and billboard sprites render (ref: terrain shaders +
    gl_image_quilt.c, map/foliage.c + gl_foliage.c, gl_sprite.c)."""
    from permafrost_engine_tpu.core.config import EngineConfig
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.scene import SceneRenderer
    from permafrost_engine_tpu.script import pf

    cfg = EngineConfig(max_ents=8)
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.heights = np.full((cfg.field_h, cfg.field_w), 3.0, np.float32)
    eng.step(1)
    cam = Camera(pos=np.array([450.0, 60.0, 520.0]), pitch=-45.0, yaw=90.0,
                 aspect=1.0)

    r = SceneRenderer(eng, 128, 128, shadows=False, reflections=False,
                      foliage_blades=2048)
    assert len(np.asarray(r.f_verts)) > 100      # blades placed on grass
    img = r.render(cam)
    # flat green terrain + texture detail: many distinct greens mid-frame
    mid = img[64:120, :]
    greens = mid[(mid[..., 1] > mid[..., 0]) & (mid[..., 1] > mid[..., 2])]
    assert len(np.unique(greens[:, 1])) > 10      # luminance variation

    # a big sprite in view changes pixels vs the no-sprite frame
    ctx = pf.context()
    old_eng = ctx.engine
    try:
        ctx.engine = eng
        pf._sprites.clear()
        pf.spawn_sprite_static("puff", (450.0, 10.0, 470.0), 24.0, 24.0)
        img2 = r.render(cam)
    finally:
        pf._sprites.clear()
        ctx.engine = old_eng
    assert (img2 != img).any(axis=-1).sum() > 40


def test_foliage_avoids_steep_and_low_ground():
    from permafrost_engine_tpu.core.config import EngineConfig
    from permafrost_engine_tpu.game.engine import Engine
    from permafrost_engine_tpu.render.scene import SceneRenderer
    cfg = EngineConfig(max_ents=4)
    eng = Engine(cfg)
    eng.add_faction(0)
    h, w = cfg.field_h, cfg.field_w
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    heights = np.where(xx < w // 2, 3.0, -2.0).astype(np.float32)  # lake east
    eng.heights = heights
    r = SceneRenderer(eng, 128, 128, shadows=False)
    blades = np.asarray(r.f_verts)
    assert len(blades) > 0
    # all blades on the grassy west half, none in the lake
    assert (blades[:, 0, 0] < cfg.world_w / 2 + 20).all()


def test_near_plane_clipping_keeps_ground_under_low_camera():
    """A low, near-horizontal camera sits 'inside' the ground quad: every
    triangle has a vertex behind the eye, so rejection-only projection
    drops the whole floor. clip_near must recover the in-front part and
    interpolate attributes exactly (verified against ray-plane hits)."""
    from permafrost_engine_tpu.render.camera import Camera

    cam = Camera(pos=np.array([0.0, 8.0, 0.0]), pitch=-25.0, yaw=90.0,
                 aspect=1.0)
    vp = jnp.asarray((cam.proj_matrix() @ cam.view_matrix())
                     .astype(np.float32))
    w = h = 64

    s = 500.0
    quad = np.array([
        [[-s, 0, -s], [s, 0, -s], [s, 0, s]],
        [[-s, 0, -s], [s, 0, s], [-s, 0, s]],
    ], np.float32)
    attrs = np.zeros((2, 3, 9), np.float32)
    attrs[..., 0:3] = quad                      # carry world pos as attrs

    # without clipping: the whole floor is rejected
    _, _, _, valid0, _ = project(jnp.asarray(quad), vp, w, h)
    assert int(valid0.sum()) == 0

    verts2, attrs2, ok2 = raster.clip_near(jnp.asarray(quad),
                                           jnp.asarray(attrs), vp)
    xy, z, inv_w, valid, flip = project(verts2, vp, w, h)
    valid = valid & ok2
    attrs2 = jnp.where(flip[:, None, None], attrs2[:, ::-1], attrs2)
    assert int(valid.sum()) >= 2
    zb, tri, bary = raster_gbuffer(xy, z, valid, h=h, w=w, k=16, kbig=8)
    tri_np, bary_np = np.asarray(tri), np.asarray(bary)
    covered = tri_np >= 0
    # the ground fills (at least) the bottom third of the frame
    assert covered[-h // 3:, :].all()

    # perspective-correct world position at sampled pixels == ray-plane hit
    rays = raster.camera_rays(cam, w, h)
    iw_np, a_np = np.asarray(inv_w), np.asarray(attrs2)
    for (r, c) in [(60, 10), (50, 32), (44, 60), (63, 31)]:
        t = tri_np[r, c]
        assert t >= 0
        pw = bary_np[r, c] * iw_np[t]
        pw = pw / pw.sum()
        wp = (pw[:, None] * a_np[t, :, 0:3]).sum(0)
        ray = rays[r, c]
        hit = np.array([0.0, 8.0, 0.0]) + ray * (-8.0 / ray[1])
        assert np.allclose(wp, hit, atol=0.5), (wp, hit)
