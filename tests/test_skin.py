"""Device skinning stage (ops/skin.py): palettes vs a NumPy oracle, clip
FSM transitions inside the tick, and session round-trip with skinning on.

Mirrors the reference's anim stack: A_Update clip clocks (src/anim/anim.c)
+ the shared anim texture of joint palettes (src/anim/anim_texture.c:93-145).
"""

import numpy as np
import pytest


def _np_palette(bank_np, parents, inv_bind, clip, tsec, fps=24.0):
    """Brute-force single-entity palette: lerp/slerp keyframes, walk the
    hierarchy, multiply inverse bind."""
    pack, frames, loop, f_max = bank_np
    nf = int(frames[clip])
    ph = tsec * fps
    if loop[clip]:
        ph = ph % nf
        i0 = min(int(np.floor(ph)), nf - 1)
        i1 = (i0 + 1) % nf
    else:
        ph = min(ph, nf - 1.0)
        i0 = min(int(np.floor(ph)), nf - 1)
        i1 = min(i0 + 1, nf - 1)
    w = ph - i0
    r0 = pack[clip * f_max + i0]
    r1 = pack[clip * f_max + i1]
    tr = r0[:, 0:3] * (1 - w) + r1[:, 0:3] * w
    sc = r0[:, 7:10] * (1 - w) + r1[:, 7:10] * w
    # slerp
    q0, q1 = r0[:, 3:7].copy(), r1[:, 3:7].copy()
    dot = np.sum(q0 * q1, -1, keepdims=True)
    q1 = np.where(dot < 0, -q1, q1)
    dot = np.abs(dot)
    theta = np.arccos(np.clip(dot, -1, 1))
    st = np.sin(theta)
    w0 = np.where(st > 1e-5, np.sin((1 - w) * theta) / np.where(st > 1e-5, st, 1), 1 - w)
    w1 = np.where(st > 1e-5, np.sin(w * theta) / np.where(st > 1e-5, st, 1), w)
    q = w0 * q0 + w1 * q1
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)

    j = parents.shape[0]
    local = np.zeros((j, 4, 4), np.float64)
    for k in range(j):
        x, y, z, ww = q[k]
        n = x * x + y * y + z * z + ww * ww
        s = 2.0 / n if n > 0 else 0.0
        r = np.array([
            [1 - s * (y * y + z * z), s * (x * y - ww * z), s * (x * z + ww * y)],
            [s * (x * y + ww * z), 1 - s * (x * x + z * z), s * (y * z - ww * x)],
            [s * (x * z - ww * y), s * (y * z + ww * x), 1 - s * (x * x + y * y)],
        ])
        m = np.eye(4)
        m[:3, :3] = r * sc[k][None, :]
        m[:3, 3] = tr[k]
        local[k] = m
    glob = np.zeros_like(local)
    for k in range(j):
        p = parents[k]
        glob[k] = local[k] if p < 0 else glob[p] @ local[k]
    return glob @ inv_bind


def test_skin_palettes_match_oracle():
    import jax.numpy as jnp

    from permafrost_engine_tpu.ops import skin

    bank = skin.make_procedural_bank(20)
    pack = np.asarray(bank.pack)
    frames = np.asarray(bank.frames)
    loop = np.asarray(bank.loop)
    parents = np.asarray(bank.parents)
    inv_bind = np.asarray(bank.inv_bind, np.float64)
    bank_np = (pack, frames, loop, bank.max_frames)

    rng = np.random.default_rng(0)
    n = 33
    clip = rng.integers(0, 4, n).astype(np.int32)
    tsec = (rng.random(n) * 3.0).astype(np.float32)
    got = np.asarray(skin.skin_palettes(
        bank, jnp.asarray(clip), jnp.asarray(tsec)))
    assert got.shape == (n, 20, 4, 4)
    for i in range(n):
        want = _np_palette(bank_np, parents, inv_bind,
                           int(clip[i]), float(tsec[i]))
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)


def test_once_clip_holds_last_frame():
    import jax.numpy as jnp

    from permafrost_engine_tpu.ops import skin

    bank = skin.make_procedural_bank(12)
    # CLIP_DIE is ONCE: sampling far past the end equals the last keyframe
    late = np.asarray(skin.skin_palettes(
        bank, jnp.asarray([skin.CLIP_DIE]), jnp.asarray([100.0])))
    nf = int(np.asarray(bank.frames)[skin.CLIP_DIE])
    at_end = np.asarray(skin.skin_palettes(
        bank, jnp.asarray([skin.CLIP_DIE]),
        jnp.asarray([(nf - 1) / skin.ANIM_FPS])))
    np.testing.assert_allclose(late, at_end, rtol=1e-5, atol=1e-5)


def test_loop_clip_wraps():
    import jax.numpy as jnp

    from permafrost_engine_tpu.ops import skin

    bank = skin.make_procedural_bank(12)
    nf = int(np.asarray(bank.frames)[skin.CLIP_RUN])
    dur = nf / skin.ANIM_FPS
    a = np.asarray(skin.skin_palettes(
        bank, jnp.asarray([skin.CLIP_RUN]), jnp.asarray([0.31])))
    b = np.asarray(skin.skin_palettes(
        bank, jnp.asarray([skin.CLIP_RUN]), jnp.asarray([0.31 + 2 * dur])))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.fixture
def skinned_engine():
    from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
    from permafrost_engine_tpu.game.engine import Engine

    cfg = EngineConfig(max_ents=64, chunks_r=1, chunks_c=1, num_layers=1,
                       skin_joints=16)
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    return eng


def test_tick_clip_fsm_and_palettes(skinned_engine):
    """Clip selection follows the sim FSMs inside the jitted tick: idle at
    rest, RUN while moving, DIE once dead; palettes change frame-to-frame
    and clip restarts are tracked via anim.start."""
    from permafrost_engine_tpu.ops import skin

    eng = skinned_engine
    u = eng.spawn_batch(np.array([[10.0, 10.0], [30.0, 30.0]], np.float32),
                        faction=0, max_speed=20.0)
    eng.step(2)
    clips = np.asarray(eng.state.anim.clip)
    s = [eng.uid_to_slot[x] for x in u]
    assert clips[s[0]] == skin.CLIP_IDLE

    eng.move([u[0]], (60.0, 60.0))
    eng.step(6)
    clips = np.asarray(eng.state.anim.clip)
    assert clips[s[0]] == skin.CLIP_RUN
    assert clips[s[1]] == skin.CLIP_IDLE

    p1 = np.asarray(eng.state.anim.palettes)[s[0]]
    eng.step(1)
    p2 = np.asarray(eng.state.anim.palettes)[s[0]]
    assert not np.allclose(p1, p2), "palettes must advance every frame"

    # kill unit 0 (hp -> 0; the combat FSM takes it to DEATH_ANIM/CORPSE):
    # the clip flips to DIE and the start tick is stamped
    eng.state = eng.state.replace(ents=eng.state.ents.replace(
        hp=eng.state.ents.hp.at[s[0]].set(0.0)))
    eng.step(12)
    clips = np.asarray(eng.state.anim.clip)
    assert clips[s[0]] == skin.CLIP_DIE
    starts = np.asarray(eng.state.anim.start)
    assert starts[s[0]] > 0, "clip restart must stamp anim.start"


def test_micro_vs_scan_identical_with_skinning(skinned_engine):
    """Fused scan stepping must produce bit-identical anim state to
    per-frame stepping (the micro-batch contract extends to the skin
    stage)."""
    import jax

    from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
    from permafrost_engine_tpu.game.engine import Engine

    def build():
        cfg = EngineConfig(max_ents=64, chunks_r=1, chunks_c=1,
                           num_layers=1, skin_joints=16)
        e = Engine(cfg)
        e.add_faction(0)
        u = e.spawn_batch(np.array([[10.0, 10.0], [20.0, 14.0]], np.float32),
                          faction=0, max_speed=15.0)
        e.move(u, (60.0, 60.0))
        return e

    a, b = build(), build()
    a.micro_batching = False
    for _ in range(30):
        a.step(1)
    b.step_scan(30)
    pa = np.asarray(a.state.anim.palettes)
    pb = np.asarray(b.state.anim.palettes)
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(np.asarray(a.state.anim.clip),
                                  np.asarray(b.state.anim.clip))


def test_session_roundtrip_with_skinning(skinned_engine, tmp_path):
    from permafrost_engine_tpu.core import session

    eng = skinned_engine
    u = eng.spawn_batch(np.array([[10.0, 10.0]], np.float32), faction=0)
    eng.move(u, (50.0, 50.0))
    eng.step(12)
    path = str(tmp_path / "skin.sess")
    session.save_session(eng, path)
    eng2 = session.load_session(path)
    np.testing.assert_array_equal(np.asarray(eng.state.anim.clip),
                                  np.asarray(eng2.state.anim.clip))
    np.testing.assert_array_equal(np.asarray(eng.state.anim.palettes),
                                  np.asarray(eng2.state.anim.palettes))
    eng.step(5)
    eng2.step(5)
    np.testing.assert_array_equal(np.asarray(eng.state.anim.palettes),
                                  np.asarray(eng2.state.anim.palettes))
