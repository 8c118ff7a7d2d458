"""Collision library + noise sanity."""

import numpy as np
import jax.numpy as jnp

from permafrost_engine_tpu.ops import collision as C
from permafrost_engine_tpu.render.camera import Camera
from permafrost_engine_tpu.utils import noise


def test_ray_aabb():
    hit, t = C.ray_aabb(jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
                        jnp.asarray([[5.0, -1, -1], [5.0, 2, 2]]),
                        jnp.asarray([[7.0, 1, 1], [7.0, 4, 4]]))
    hit, t = np.asarray(hit), np.asarray(t)
    assert hit[0] and not hit[1]      # second box is off-axis
    np.testing.assert_allclose(t[0], 5.0, atol=1e-5)


def test_ray_obb_rotated():
    # box rotated 45deg: the ray along +x hits its corner region
    hit, t = C.ray_obb(jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 0, 0]),
                       jnp.asarray([[10.0, 0, 0]]), jnp.asarray([[1.0, 1, 1]]),
                       jnp.asarray([np.pi / 4]))
    assert np.asarray(hit)[0]
    assert 8.4 < float(np.asarray(t)[0]) < 9.0   # sqrt(2) half-diagonal


def test_sphere_obb():
    inside = C.sphere_obb_test(
        jnp.asarray([0.0, 0, 2.4]), 0.5,
        jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[1.0, 1, 2]]),
        jnp.asarray([0.0]))
    assert np.asarray(inside)[0]
    outside = C.sphere_obb_test(
        jnp.asarray([0.0, 0, 2.6]), 0.5,
        jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[1.0, 1, 2]]),
        jnp.asarray([0.0]))
    assert not np.asarray(outside)[0]


def test_frustum_obb_matches_visible():
    cam = Camera()
    cam.pos = np.array([0.0, 50.0, 0.0])
    cam.pitch, cam.yaw = -45.0, -90.0    # looking toward +z
    planes = jnp.asarray(cam.frustum_planes())
    centers = jnp.asarray([[0.0, 0.0, 50.0],     # in front
                           [0.0, 0.0, -200.0]])  # behind
    vis = np.asarray(C.frustum_obb_test(
        planes, centers, jnp.full((2, 3), 2.0), jnp.zeros(2)))
    assert vis[0] and not vis[1]


def test_swept_sphere_obb():
    hit = C.swept_sphere_obb(
        jnp.asarray([-10.0, 0, 0]), jnp.asarray([10.0, 0, 0]), 0.5,
        jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[1.0, 1, 1]]),
        jnp.asarray([0.0]), steps=8)
    assert np.asarray(hit)[0]
    miss = C.swept_sphere_obb(
        jnp.asarray([-10.0, 0, 10.0]), jnp.asarray([10.0, 0, 10.0]), 0.5,
        jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[1.0, 1, 1]]),
        jnp.asarray([0.0]), steps=8)
    assert not np.asarray(miss)[0]


def test_noise_range_and_tileable():
    xs, ys = np.mgrid[0:32, 0:32] / 7.3
    n = noise.perlin2(xs, ys, seed=3)
    assert n.shape == (32, 32)
    assert np.abs(n).max() <= 1.5
    assert n.std() > 0.05               # not constant
    img = noise.tileable2(32, 32, scale=6.0, seed=1)
    # seamless: wrap-around difference is as small as interior differences
    wrap = np.abs(img[:, 0] - img[:, -1]).mean()
    interior = np.abs(np.diff(img, axis=1)).mean()
    assert wrap < interior * 4
