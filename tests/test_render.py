"""Render layer: pose palettes, frustum culling, draw buffers, minimap."""

import numpy as np
import jax.numpy as jnp

from permafrost_engine_tpu.ops import pose as pose_ops
from permafrost_engine_tpu.render.camera import Camera
from permafrost_engine_tpu.render.draw import draw_buffers, minimap_raster
from permafrost_engine_tpu.game.engine import Engine
from tests.test_engine_move import small_cfg


def test_trs_to_mat_identity():
    m = np.asarray(pose_ops.trs_to_mat(
        jnp.zeros((1, 3)), jnp.asarray([[0.0, 0, 0, 1]]), jnp.ones((1, 3))))
    np.testing.assert_allclose(m[0], np.eye(4), atol=1e-6)


def test_pose_palette_two_joint_chain():
    """Root translated +2x; child offset +3y from root. Child's global
    position must be (2, 3, 0)."""
    parents = np.array([-1, 0], np.int32)
    local_t = jnp.asarray([[[2.0, 0, 0], [0.0, 3, 0]]])       # [1, 2, 3]
    quat_id = jnp.asarray([[[0.0, 0, 0, 1]] * 2])
    scale1 = jnp.ones((1, 2, 3))
    local = pose_ops.trs_to_mat(local_t, quat_id, scale1)
    levels = tuple(tuple(l.tolist())
                   for l in pose_ops.hierarchy_levels(parents))
    palette = pose_ops.pose_palette(
        local, jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
        jnp.asarray(parents), levels)
    child_pos = np.asarray(palette)[0, 1, :3, 3]
    np.testing.assert_allclose(child_pos, [2.0, 3.0, 0.0], atol=1e-5)


def test_pose_palette_rotation_chain():
    """Root rotated 90deg about Z; child offset +1x in root space lands at
    +1y in object space."""
    parents = np.array([-1, 0], np.int32)
    rot90z = pose_ops.trs_to_mat(
        jnp.zeros((1, 1, 3)),
        jnp.asarray([[[0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]]]),
        jnp.ones((1, 1, 3)))
    child = pose_ops.trs_to_mat(
        jnp.asarray([[[1.0, 0, 0]]]), jnp.asarray([[[0.0, 0, 0, 1]]]),
        jnp.ones((1, 1, 3)))
    local = jnp.concatenate([rot90z, child], axis=1)
    levels = tuple(tuple(l.tolist())
                   for l in pose_ops.hierarchy_levels(parents))
    palette = pose_ops.pose_palette(
        local, jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
        jnp.asarray(parents), levels)
    child_pos = np.asarray(palette)[0, 1, :3, 3]
    np.testing.assert_allclose(child_pos, [0.0, 1.0, 0.0], atol=1e-5)


def test_quat_slerp_endpoints():
    q0 = jnp.asarray([0.0, 0, 0, 1])
    q1 = jnp.asarray([0.0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    s0 = np.asarray(pose_ops.quat_slerp(q0, q1, jnp.asarray(0.0)))
    s1 = np.asarray(pose_ops.quat_slerp(q0, q1, jnp.asarray(1.0)))
    np.testing.assert_allclose(s0, q0, atol=1e-6)
    np.testing.assert_allclose(s1, q1, atol=1e-6)


def test_draw_buffers_culling():
    eng = Engine(small_cfg())
    # one unit in front of the camera, one far behind
    near = eng.spawn_batch(np.array([[120.0, 120.0]], np.float32))
    far = eng.spawn_batch(np.array([[500.0, 500.0]], np.float32))
    cam = Camera()
    cam.pos = np.array([120.0, 50.0, 60.0])
    cam.pitch, cam.yaw = -45.0, -90.0   # look toward +z
    out = draw_buffers(eng, cam)
    vis = np.asarray(out["visible"])
    assert vis[eng.uid_to_slot[near[0]]]
    # model matrix encodes translation
    m = np.asarray(out["model_mats"])[eng.uid_to_slot[near[0]]]
    np.testing.assert_allclose(m[:3, 3], [120.0, 0.0, 120.0], atol=1e-5)
    assert np.asarray(out["health_frac"])[eng.uid_to_slot[near[0]]] == 1.0


def test_minimap_raster():
    eng = Engine(small_cfg())
    eng.spawn_batch(np.array([[256.0, 256.0]], np.float32), faction=1)
    img = minimap_raster(eng, size=128)
    assert img.shape[2] == 3
    # the unit dot is present (faction 1 = red-ish)
    assert (img[..., 0] > 200).any()


def test_anim_system_clip_cycle():
    from permafrost_engine_tpu.assets.pfobj import AnimClip, PFObj
    from permafrost_engine_tpu.render.anim_system import AnimMode

    eng = Engine(small_cfg())
    j = 2
    clip = lambda name, frames: AnimClip(
        name, frames,
        np.zeros((frames, j, 3), np.float32),
        np.tile(np.array([0, 0, 0, 1], np.float32), (frames, j, 1)),
        np.ones((frames, j, 3), np.float32))
    model = PFObj(
        verts=np.zeros((3, 3), np.float32), uvs=np.zeros((3, 2), np.float32),
        normals=np.zeros((3, 3), np.float32),
        weight_joints=np.full((3, 4), -1, np.int32),
        weight_vals=np.zeros((3, 4), np.float32),
        vert_mat=np.zeros(3, np.int32), materials=[],
        joint_parents=np.array([-1, 0], np.int32), joint_names=["a", "b"],
        bind_trans=np.zeros((j, 3), np.float32),
        bind_rots=np.tile(np.array([0, 0, 0, 1], np.float32), (j, 1)),
        bind_scales=np.ones((j, 3), np.float32),
        clips={"idle": clip("idle", 8), "attack": clip("attack", 4)},
        bbox=None)
    eng.anim.load_model("m", model)
    eng.anim.register(7, model="m", idle_clip="idle")
    eng.anim.play(7, "attack", AnimMode.ONCE)
    assert eng.anim.current(7) == "attack"
    eng.anim.tick(1.0)  # longer than the 4-frame clip at 24 fps
    assert eng.anim.current(7) == "idle"

    pal = eng.anim.pose_palettes("m")
    assert pal.shape == (1, 2, 4, 4)
    np.testing.assert_allclose(pal[0, 0], np.eye(4), atol=1e-5)


def test_image_io_roundtrip(tmp_path):
    """stb_image analogue: load/write/resize round-trip (ref:
    src/lib/public/stb_image.h)."""
    import numpy as np
    from permafrost_engine_tpu.utils.image import (
        load_image, resize_image, write_image)

    rng = np.random.default_rng(0)
    img = (rng.random((16, 24, 4)) * 255).astype(np.uint8)
    img[..., 3] = 255
    p = str(tmp_path / "t.png")
    write_image(p, img)
    back = load_image(p, channels=4)
    np.testing.assert_array_equal(back, img)
    small = resize_image(back, 12, 8)
    assert small.shape == (8, 12, 4)
    grey = load_image(p, channels=1)
    assert grey.shape == (16, 24, 1)
