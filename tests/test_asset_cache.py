"""Baked-binary asset cache (ref: src/asset_cache.c)."""

import numpy as np

from permafrost_engine_tpu.assets.cache import cached_parse, load_baked
from permafrost_engine_tpu.assets.pfmap import make_flat_map, parse_pfmap, write_pfmap


def test_bake_roundtrip_and_hit(tmp_path):
    m = make_flat_map(1, 1)
    m.base_height[:, 16:] = 4
    text = write_pfmap(m)
    calls = []

    def parser(t):
        calls.append(1)
        return parse_pfmap(t)

    d = str(tmp_path)
    a = cached_parse("pfmap", text, parser, cache_dir=d)
    b = cached_parse("pfmap", text, parser, cache_dir=d)
    assert len(calls) == 1, "second load should hit the bake"
    np.testing.assert_array_equal(a.base_height, b.base_height)
    np.testing.assert_array_equal(a.pathable, b.pathable)

    # a content change misses (hash-keyed, ref: bake invalidation)
    m.base_height[:, :8] = -4
    text2 = write_pfmap(m)
    assert load_baked("pfmap", text2, cache_dir=d) is None
    c = cached_parse("pfmap", text2, parser, cache_dir=d)
    assert len(calls) == 2
    assert (c.base_height[:, :8] == -4).all()
