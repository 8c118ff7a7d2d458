"""Array-level tests for the pf.debug.* visualization overlays
(ref: nav.c:2520-3320, clearpath.c:420, formation.c:1378, region.c:459)."""

import numpy as np
import pytest

from permafrost_engine_tpu.core.config import NAV_TILE_SIZE, CHUNK_SIZE_UNITS
from permafrost_engine_tpu.render import debug_overlays as dbg


def test_flow_arrows_match_codes():
    codes = np.zeros((8, 8), np.uint8)
    codes[2, 3] = 2   # N  -> (dx, dz) = (0, -1) tiles
    codes[5, 1] = 5   # E  -> (+1, 0)
    codes[7, 7] = 8   # SE -> (+1, +1)
    starts, vecs = dbg.flow_arrows(codes, (0.0, 0.0), decimate=1)
    assert len(starts) == 3
    # arrow at tile (2,3): centre (3.5, 2.5) * tile, direction north (-z)
    i = np.argmin(np.abs(starts[:, 0] - 3.5 * NAV_TILE_SIZE)
                  + np.abs(starts[:, 1] - 2.5 * NAV_TILE_SIZE))
    assert np.allclose(starts[i], (3.5 * NAV_TILE_SIZE, 2.5 * NAV_TILE_SIZE))
    assert vecs[i][0] == 0 and vecs[i][1] < 0
    # E arrow points +x, SE points +x +z
    j = np.argmin(np.abs(starts[:, 1] - 5.5 * NAV_TILE_SIZE))
    assert vecs[j][0] > 0 and vecs[j][1] == 0
    k = np.argmax(starts[:, 0])
    assert vecs[k][0] > 0 and vecs[k][1] > 0


def test_flow_arrows_skips_fd_none_and_offsets_origin():
    codes = np.zeros((4, 4), np.uint8)
    codes[0, 0] = 7   # S
    starts, vecs = dbg.flow_arrows(codes, (100.0, 200.0), decimate=1)
    assert len(starts) == 1
    assert np.allclose(starts[0], (100.0 + 0.5 * NAV_TILE_SIZE,
                                   200.0 + 0.5 * NAV_TILE_SIZE))
    assert vecs[0][1] > 0  # south = +z


def test_tile_mask_points():
    m = np.zeros((6, 6), bool)
    m[1, 2] = True
    m[4, 5] = True
    pts = dbg.tile_mask_points(m, (0.0, 0.0), tile=4.0)
    assert len(pts) == 2
    assert (pts == np.array([[10.0, 6.0], [22.0, 18.0]], np.float32)).all()


def test_island_points_colors_by_id():
    isl = np.array([[0, 0], [1, 1]])
    passable = np.ones((2, 2), bool)
    pts, cols = dbg.island_points(isl, passable, decimate=1)
    assert len(pts) == 4
    # same island id -> same color, different id -> different color
    assert (cols[0] == cols[1]).all()
    assert not (cols[0] == cols[2]).all()


def test_portal_segments_geometry():
    from permafrost_engine_tpu.nav.portals import Portal, PortalGraph
    # a pair across the (0,0)/(0,1) vertical border, span tiles 10..19
    p0 = Portal(pid=0, chunk=(0, 0), side="E", lo=10, hi=19, paired=1)
    p1 = Portal(pid=1, chunk=(0, 1), side="W", lo=10, hi=19, paired=0)
    g = PortalGraph(portals=[p0, p1], adj={0: [(1, 1.0)], 1: [(0, 1.0)]},
                    by_chunk={(0, 0): [0], (0, 1): [1]})
    spans, links = dbg.portal_segments(g)
    assert spans.shape == (2, 2, 2)
    # p0 span sits on the east border of chunk (0,0) at x = CHUNK_SIZE
    assert np.allclose(spans[0][:, 0], CHUNK_SIZE_UNITS)
    assert np.allclose(spans[0][0][1], 10 * NAV_TILE_SIZE)
    assert np.allclose(spans[0][1][1], 20 * NAV_TILE_SIZE)
    # one link joining the two midpoints (drawn once, pid < paired)
    assert links.shape == (1, 2, 2)
    assert np.allclose(links[0][0], links[0][1])  # mirrored portals coincide


def test_hrvo_cone_geometry_matches_solver():
    # two units approaching head-on; cone half-angle sin = combR/dist
    pos = np.array([[0.0, 0.0], [10.0, 0.0]], np.float32)
    vel = np.array([[1.0, 0.0], [-1.0, 0.0]], np.float32)
    rad = np.array([1.0, 1.0], np.float32)
    out = dbg.hrvo_cones(pos, vel, rad, 0, np.array([1]))
    exp_sin = (2.0 * 1.05) / 10.0
    assert np.allclose(out["sin_t"], exp_sin, atol=1e-6)
    # RVO apex = mean of the two velocities = 0
    assert np.allclose(out["apex"][0], 0.0)
    # legs are p_hat rotated +/- theta: both unit length * leg_len,
    # symmetric about p_hat = +x
    ll = out["legs_l"][0] / np.linalg.norm(out["legs_l"][0])
    lr = out["legs_r"][0] / np.linalg.norm(out["legs_r"][0])
    assert np.allclose(ll[0], lr[0], atol=1e-6)       # same x component
    assert np.allclose(ll[1], -lr[1], atol=1e-6)      # mirrored z
    assert np.allclose(ll[0], np.sqrt(1 - exp_sin**2), atol=1e-5)


def test_region_outline_shapes():
    from permafrost_engine_tpu.game.region import Region
    rect = Region("r", "rect", (100.0, 50.0), half_x=10.0, half_z=5.0)
    poly = dbg.region_outline(rect)
    assert poly.shape == (5, 2)
    assert np.allclose(poly[0], poly[-1])           # closed
    assert poly[:, 0].min() == 90.0 and poly[:, 0].max() == 110.0
    circ = Region("c", "circle", (0.0, 0.0), radius=7.0)
    cpts = dbg.region_outline(circ)
    assert np.allclose(np.linalg.norm(cpts, axis=-1), 7.0, atol=1e-4)


def test_chunk_boundary_lines():
    segs = dbg.chunk_boundary_lines(2, 3)
    assert segs.shape == ((2 + 1) + (3 + 1), 2, 2)
    xs = segs[:, :, 0]
    assert xs.max() == 3 * CHUNK_SIZE_UNITS


@pytest.fixture(scope="module")
def small_ctx():
    import permafrost_engine_tpu.script.pf as pf
    from permafrost_engine_tpu.core.config import EngineConfig
    pf.init(EngineConfig(max_ents=32, chunks_r=1, chunks_c=2,
                         num_layers=1, max_flocks=4, max_projectiles=8,
                         field_slab_slots=8, los_slab_slots=8))
    yield pf
    pf._context = None


def test_overlays_render_and_gate_on_settings(small_ctx):
    pf = small_ctx
    ctx = pf.context()
    eng = ctx.engine
    ents = [pf.MovableEntity("u.pfobj", f"u{i}", pos=(40 + 8 * i, 0, 40),
                             speed=40.0) for i in range(4)]
    pf.move_in_formation(ents, (400.0, 0.0, 100.0), pf.FORMATION_RANK)
    pf.step(4)
    pf.set_unit_selection([e.uid for e in ents])
    eng.regions.add_circle("zone", (100.0, 100.0), 30.0)

    from permafrost_engine_tpu.render.scene import SceneRenderer
    r = SceneRenderer(eng, 160, 96, shadows=False, reflections=False)
    cam = ctx.cameras[ctx.active_camera]
    cam.pos = np.array([150.0, 120.0, 250.0])
    cam.pitch, cam.yaw = -45.0, 90.0   # look north-down over the map

    base = r.render(cam)
    pf.show_regions()
    for name in ("show_flow_fields", "show_nav_portals", "show_nav_islands",
                 "show_nav_cost_base", "show_nav_blockers",
                 "show_chunk_boundaries", "show_hrvo_debug",
                 "show_formations", "show_combat_ranges",
                 "show_combat_targets", "show_faction_vision"):
        pf.settings_set(f"pf.debug.{name}", True)
    on = r.render(cam)
    # overlays must change the frame and only when enabled
    assert (on != base).any()
    for name in ("show_flow_fields", "show_nav_portals", "show_nav_islands",
                 "show_nav_cost_base", "show_nav_blockers",
                 "show_chunk_boundaries", "show_hrvo_debug",
                 "show_formations", "show_combat_ranges",
                 "show_combat_targets", "show_faction_vision"):
        pf.settings_set(f"pf.debug.{name}", False)
    off = r.render(cam)
    # region outline still drawn (pf.show_regions), flow arrows gone
    pf.hide_regions()
    clean = r.render(cam)
    assert (off != clean).any() or (off == base).all()
    assert (clean == base).all()


def test_flow_overlay_arrows_match_installed_field(small_ctx):
    """The arrows drawn for a flock's chunk field decode the exact codes
    stored in the slab (the 'arrows match flow_dirs' check)."""
    pf = small_ctx
    eng = pf.context().engine
    st = eng.state
    active = np.asarray(st.flocks.active)
    assert active.any()
    f = int(np.nonzero(active)[0][0])
    slots = np.asarray(st.flocks.field_slot)[f]
    chunk = int(np.nonzero(slots >= 0)[0][0])
    codes = np.asarray(st.fields.flow[int(slots[chunk])])
    starts, vecs = dbg.flow_arrows(codes, (0.0, 0.0), decimate=1)
    # every arrow's direction equals the decoded FLOW_DIR_OFFSETS entry
    from permafrost_engine_tpu.core.config import FLOW_DIR_OFFSETS
    tile_r = (starts[:, 1] / NAV_TILE_SIZE - 0.5).round().astype(int)
    tile_c = (starts[:, 0] / NAV_TILE_SIZE - 0.5).round().astype(int)
    want = np.array([(dc, dr) for dr, dc in FLOW_DIR_OFFSETS], np.float32)[
        codes[tile_r, tile_c]]
    got = vecs / np.maximum(np.linalg.norm(vecs, axis=-1, keepdims=True),
                            1e-6)
    want_n = want / np.maximum(np.linalg.norm(want, axis=-1, keepdims=True),
                               1e-6)
    assert np.allclose(got, want_n, atol=1e-5)
    assert (codes[tile_r, tile_c] > 0).all()
