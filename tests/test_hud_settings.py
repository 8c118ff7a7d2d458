"""The presentation settings actually drive the renderer: shadows_enabled,
water_reflection/refraction/rt_scale, healthbar_mode, minimap styling,
cursor glyphs, storage/garrison panels (ref: game.c:1070-1536 settings ->
renderer state; gl_water.c:736 refraction; gl_minimap.c; cursor.c)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ctx():
    import permafrost_engine_tpu.script.pf as pf
    from permafrost_engine_tpu.core.config import EngineConfig
    pf.init(EngineConfig(max_ents=32, chunks_r=1, chunks_c=1,
                         num_layers=1, max_flocks=4, max_projectiles=8,
                         field_slab_slots=8, los_slab_slots=8))
    c = pf.context()
    # carve a lake so the water pass runs (heights feed the terrain mesh)
    c.engine.heights[:, 40:] = -2.0
    yield pf
    pf._context = None


@pytest.fixture(scope="module")
def renderer(ctx):
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.scene import SceneRenderer
    eng = ctx.context().engine
    r = SceneRenderer(eng, 128, 96, shadows=True, reflections=True,
                      shadow_res=64)
    cam = Camera(pos=np.array([120.0, 90.0, 220.0]), pitch=-40.0, yaw=90.0,
                 aspect=128 / 96)
    return r, cam


def _mm_off(pf):
    pf.context().minimap["shown"] = False


def test_water_refraction_setting_changes_water(ctx, renderer):
    pf = ctx
    r, cam = renderer
    _mm_off(pf)
    assert r.reflections
    pf.settings_set("pf.video.water_refraction", True)
    with_refr = r.render(cam)
    pf.settings_set("pf.video.water_refraction", False)
    without = r.render(cam)
    assert (with_refr != without).any()
    pf.settings_set("pf.video.water_refraction", True)


def test_water_reflection_setting_disables_pass(ctx, renderer):
    pf = ctx
    r, cam = renderer
    _mm_off(pf)
    on = r.render(cam)
    pf.settings_set("pf.video.water_reflection", False)
    off = r.render(cam)
    pf.settings_set("pf.video.water_reflection", True)
    assert (on != off).any()


def test_water_rt_scale_renders_scaled_reflection(ctx, renderer):
    pf = ctx
    r, cam = renderer
    _mm_off(pf)
    full = r.render(cam)
    pf.settings_set("pf.video.water_rt_scale", 0.5)
    half = r.render(cam)
    pf.settings_set("pf.video.water_rt_scale", 1.0)
    assert half.shape == full.shape
    assert (half != full).any()          # reflection detail changes
    # non-water pixels (left land half) unaffected by the reflection scale
    assert (half[:, :30] == full[:, :30]).mean() > 0.95


def test_shadows_enabled_setting(ctx, renderer):
    pf = ctx
    r, cam = renderer
    _mm_off(pf)
    pf.settings_set("pf.video.shadows_enabled", True)
    # a fat building to cast a visible shadow
    b = pf.BuildableEntity("b.pfobj", "tower", pos=(100.0, 0.0, 150.0),
                           radius=12.0, sel_radius=12.0)
    pf.step(1)
    on = r.render(cam)
    pf.settings_set("pf.video.shadows_enabled", False)
    off = r.render(cam)
    pf.settings_set("pf.video.shadows_enabled", True)
    assert (on != off).any()
    del b


def test_healthbar_mode_routing(ctx, renderer):
    pf = ctx
    r, cam = renderer
    _mm_off(pf)
    u = pf.CombatableEntity("u.pfobj", "u", pos=(120.0, 0.0, 140.0),
                            hp=100.0, base_dmg=1.0)
    pf.step(1)
    pf.settings_set("pf.game.healthbar_mode", 2)   # HB_MODE_NEVER
    never = r.render(cam)
    pf.settings_set("pf.game.healthbar_mode", 0)   # HB_MODE_ALWAYS
    always = r.render(cam)
    assert (always != never).any()                 # full bar drawn at full hp
    pf.hide_healthbars()                           # ctx toggle overrides
    hidden = r.render(cam)
    assert (hidden == never).all()
    pf.show_healthbars()
    pf.settings_set("pf.game.healthbar_mode", 1)
    del u


def test_minimap_styling_applied(ctx, renderer):
    pf = ctx
    r, cam = renderer
    c = pf.context()
    c.minimap["shown"] = True
    pf.set_minimap_size(200)
    pf.set_minimap_position(40, 700)
    pf.set_minimap_border_clr(255, 0, 0, 255)
    img = r.render(cam)
    px, py, s, _ = c.minimap["screen_rect"]
    # border row is the scripted color
    assert (img[py, px:px + s] == (255, 0, 0)).all()
    # a different size changes the on-screen square
    pf.set_minimap_size(120)
    img2 = r.render(cam)
    _, _, s2, _ = c.minimap["screen_rect"]
    assert s2 < s
    assert (img2 != img).any()
    c.minimap["shown"] = False
    off = r.render(cam)
    assert "screen_rect" in c.minimap
    assert (off != img2).any()


def test_cursor_glyph_composed(ctx, renderer):
    pf = ctx
    r, cam = renderer
    _mm_off(pf)
    c = pf.context()
    c.cursor["compose"] = True
    pf.inject_mouse_motion(960, 540)
    pf.activate_system_cursor("default")
    a = r.render(cam)
    pf.activate_system_cursor("attack")
    b = r.render(cam)
    c.cursor["compose"] = False
    off = r.render(cam)
    assert (a != off).any()       # glyph drawn
    assert (a != b).any()         # styling (color) respected
    assert (off == r.render(cam)).all()


def test_storage_site_panel(ctx, renderer):
    pf = ctx
    r, cam = renderer
    _mm_off(pf)
    pf.settings_set("pf.game.storage_site_ui_mode", 2)   # NEVER
    hut = pf.StorageSiteEntity("h.pfobj", "hut", pos=(100.0, 0.0, 130.0))
    hut.set_capacity("Wood", 100)
    pf.step(1)
    none = r.render(cam)
    pf.settings_set("pf.game.storage_site_ui_mode", 0)   # ALWAYS
    always = r.render(cam)
    assert (always != none).any()
    pf.settings_set("pf.game.storage_site_ui_mode", 1)   # SELECTED
    pf.clear_unit_selection()
    unsel = r.render(cam)
    assert (unsel == none).all()
    pf.set_unit_selection([hut.uid])
    sel = r.render(cam)
    assert (sel != none).any()
    pf.settings_set("pf.game.storage_site_ui_mode", 0)
