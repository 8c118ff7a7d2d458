"""Image quilting: synthesized texture is made of source material with
coherent seams (ref: gl_image_quilt.c Efros-Freeman synthesis)."""

import numpy as np

from permafrost_engine_tpu.ops.quilt import image_quilt
from permafrost_engine_tpu.utils.noise import octave2


def make_texture(n=96, seed=0):
    xs, ys = np.mgrid[0:n, 0:n] / 9.0
    base = octave2(xs, ys, octaves=3, seed=seed)
    r = (base - base.min()) / (base.max() - base.min())
    return np.stack([r, 0.5 + 0.3 * r, 1.0 - r], -1).astype(np.float32)


def test_quilt_output_from_source_patches():
    src = make_texture()
    out = image_quilt(src, 128, 128, block=32, overlap=6, stride=8, seed=1)
    assert out.shape == (128, 128, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # every sampled interior patch of the output must closely match SOME
    # source patch (the output is a quilt of source material)
    rng = np.random.default_rng(0)
    for _ in range(5):
        r, c = rng.integers(0, 128 - 8, 2)
        patch = out[r:r + 8, c:c + 8]
        best = np.inf
        for sr in range(0, 96 - 8, 4):
            for sc in range(0, 96 - 8, 4):
                d = np.mean((src[sr:sr + 8, sc:sc + 8] - patch) ** 2)
                best = min(best, d)
        assert best < 0.01, f"patch at ({r},{c}) not from source (mse {best})"


def test_quilt_seams_are_coherent():
    src = make_texture(seed=3)
    out = image_quilt(src, 96, 96, block=32, overlap=6, stride=8, seed=2)
    # seam discontinuity: gradient across block boundaries should be within
    # a few x of the interior gradient (hard cuts would be ~10x)
    g = np.abs(np.diff(out, axis=0)).mean(axis=(1, 2))
    step = 32 - 6
    seam_rows = [step * k for k in (1, 2) if step * k < len(g)]
    interior = np.median(g)
    for r in seam_rows:
        assert g[r - 1:r + 1].max() < interior * 6 + 0.05
