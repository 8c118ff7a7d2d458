"""Fused crowd kernel (ops/crowd_pallas.py) vs the XLA knn+HRVO path.

Interpret-mode only: Mosaic cannot compile through this environment's TPU
relay (see module docstring); on directly-attached hardware the same
kernel compiles and is enabled with PFTPU_USE_PALLAS=1.
"""

import numpy as np
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import MAX_NEIGHBOURS
from permafrost_engine_tpu.ops import clearpath
from permafrost_engine_tpu.ops.crowd_pallas import hrvo_select_pallas


def build_scene(n=128, c2=256, seed=0):
    """Every row ends with >= MAX_NEIGHBOURS valid unique candidates:
    rows with fewer process garbage cones whose contents legitimately
    differ between the two implementations (both mask their influence,
    but their infeasible projection candidates differ)."""
    rng = np.random.default_rng(seed)
    pos = rng.random((n, 2)).astype(np.float32) * 60
    vel = (rng.random((n, 2)).astype(np.float32) - 0.5) * 2
    radius = np.ones(n, np.float32)
    vpref = (rng.random((n, 2)).astype(np.float32) - 0.5) * 3
    max_speed = np.full(n, 2.0, np.float32)
    # candidate set: other entities, arena-gather layout, with gaps
    cand_idx = rng.integers(0, n, (n, c2)).astype(np.int32)
    cand_valid = rng.random((n, c2)) < 0.9
    cand_valid &= cand_idx != np.arange(n)[:, None]
    cand_static = rng.random((n, c2)) < 0.2
    cand_pos = pos[cand_idx]
    cand_vel = vel[cand_idx]
    cand_rad = radius[cand_idx]
    # duplicate candidates would break the one-vs-one comparison with the
    # XLA reference (both pick k nearest, ties resolve differently), so
    # spread duplicates out
    for i in range(n):
        _, first = np.unique(cand_idx[i], return_index=True)
        keep = np.zeros(c2, bool)
        keep[first] = True
        cand_valid[i] &= keep
    return (pos, vel, radius, vpref, max_speed,
            cand_pos, cand_vel, cand_rad, cand_valid, cand_static), cand_idx


def xla_reference(scene, cand_idx, exact=False):
    """Exact top-k + ops/clearpath on the same candidate set. Candidates
    are arena entities, so the selected arena indices drive clearpath's
    own vel/radius gathers."""
    (pos, vel, radius, vpref, max_speed,
     cand_pos, cand_vel, cand_rad, cand_valid, cand_static) = scene
    n = pos.shape[0]
    d2 = ((cand_pos - pos[:, None, :]) ** 2).sum(-1)
    d2 = np.where(cand_valid, d2, np.inf)
    order = np.argsort(d2, axis=1, kind="stable")[:, :MAX_NEIGHBOURS]
    rows = np.arange(n)[:, None]
    sel_valid = np.isfinite(d2[rows, order])
    return np.asarray(clearpath.new_velocities(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(radius),
        jnp.asarray(vpref), jnp.asarray(max_speed),
        jnp.asarray(cand_idx[rows, order]),
        jnp.asarray(sel_valid),
        jnp.asarray(cand_static[rows, order]),
        jnp.ones(n, bool),
        neigh_pos=jnp.asarray(cand_pos[rows, order]),
        exact=exact,
    ))


def hrvo_score(v, pos, vel, radius, vpref, cand_pos, cand_vel, cand_rad,
               cand_valid, cand_static, d2):
    """Reference scorer: violations + distance-to-vpref of velocity v
    against the exact top-K cones (numpy mirror of clearpath.c:368-388)."""
    n = pos.shape[0]
    order = np.argsort(d2, axis=1, kind="stable")[:, :MAX_NEIGHBOURS]
    rows = np.arange(n)[:, None]
    nvalid = np.isfinite(d2[rows, order])
    npos = cand_pos[rows, order]
    nstat = cand_static[rows, order]
    nvel = np.where(nstat[..., None], 0.0, cand_vel[rows, order])
    nrad = cand_rad[rows, order]
    rel = npos - pos[:, None, :]
    dist = np.linalg.norm(rel, axis=-1)
    comb_r = (radius[:, None] + nrad) * 1.05
    colliding = nvalid & (dist < comb_r)
    p_hat = rel / np.maximum(dist, 1e-6)[..., None]
    sin_t = np.clip(comb_r / np.maximum(dist, 1e-6), 0.0, 1.0)
    cos_t = np.sqrt(np.maximum(1.0 - sin_t ** 2, 0.0))
    cos_t = np.where(colliding, 0.0, cos_t)
    apex = np.where(nstat[..., None], nvel, (vel[:, None, :] + nvel) / 2.0)
    wc = v[:, None, :] - apex
    wlen = np.linalg.norm(wc, axis=-1)
    along = np.sum(wc * p_hat, axis=-1)
    inside = (along > wlen * cos_t + 1e-6) & nvalid
    nviol = inside.sum(1)
    return nviol, np.linalg.norm(v - vpref, axis=1)


def test_fused_kernel_matches_xla_reference():
    """Same cones + same candidate fan: the kernel's pick must be exactly
    the XLA pick on most rows, and on near-tie rows (fp trig differences
    flip the winner between equal-quality candidates) it must be at least
    as good under the reference scorer."""
    scene, cand_idx = build_scene()
    (pos, vel, radius, vpref, max_speed,
     cand_pos, cand_vel, cand_rad, cand_valid, cand_static) = scene
    got = np.asarray(hrvo_select_pallas(
        *[jnp.asarray(a) for a in scene], interpret=True))
    want = xla_reference(scene, cand_idx)
    err = np.linalg.norm(got - want, axis=1)
    assert np.median(err) == 0.0
    assert (err < 1e-4).mean() > 0.5

    d2 = ((cand_pos - pos[:, None, :]) ** 2).sum(-1)
    d2 = np.where(cand_valid, d2, np.inf)
    gv, gd = hrvo_score(got, pos, vel, radius, vpref, cand_pos, cand_vel,
                        cand_rad, cand_valid, cand_static, d2)
    wv, wd = hrvo_score(want, pos, vel, radius, vpref, cand_pos, cand_vel,
                        cand_rad, cand_valid, cand_static, d2)
    # never more violations than the XLA pick; when violations tie, the
    # chosen velocity is as close to vpref (small slack for the scorer's
    # own fp boundary sensitivity)
    assert (gv <= wv).all(), f"worse feasibility on {np.nonzero(gv > wv)[0]}"
    ties = gv == wv
    assert (gd[ties] <= wd[ties] + 0.05).all(), \
        f"worse picks at {np.nonzero(gd > wd + 0.05)[0]}"


def test_fused_kernel_exact_mode_matches_xla_exact():
    """exact=True: the kernel's reference-exact construction (tangent-point
    edges, HRVO apex slide, pairwise edge intersections, inside_pcr test,
    remove-furthest cascade) against ops/clearpath exact mode on the same
    cones. Same structure as the fan-mode test: most rows identical,
    near-tie rows at least as good under the reference scorer."""
    scene, cand_idx = build_scene(seed=3)
    (pos, vel, radius, vpref, max_speed,
     cand_pos, cand_vel, cand_rad, cand_valid, cand_static) = scene
    got = np.asarray(hrvo_select_pallas(
        *[jnp.asarray(a) for a in scene], interpret=True, exact=True))
    want = xla_reference(scene, cand_idx, exact=True)
    err = np.linalg.norm(got - want, axis=1)
    assert np.median(err) == 0.0
    assert (err < 1e-4).mean() > 0.5, (err < 1e-4).mean()

    d2 = ((cand_pos - pos[:, None, :]) ** 2).sum(-1)
    d2 = np.where(cand_valid, d2, np.inf)
    gv, gd = hrvo_score(got, pos, vel, radius, vpref, cand_pos, cand_vel,
                        cand_rad, cand_valid, cand_static, d2)
    wv, wd = hrvo_score(want, pos, vel, radius, vpref, cand_pos, cand_vel,
                        cand_rad, cand_valid, cand_static, d2)
    # the scorer uses the fan-mode cone geometry, so allow one cone of
    # disagreement on rows where the exact edge test sits on the boundary
    assert (gv <= wv + 1).all(), f"worse feasibility: {np.nonzero(gv > wv + 1)[0]}"
    ties = gv == wv
    assert (gd[ties] <= wd[ties] + 0.05).all(), \
        f"worse picks at {np.nonzero(gd > wd + 0.05)[0]}"


def test_engine_runs_on_pallas_backends(monkeypatch):
    """PFTPU_USE_PALLAS=1 routes the movement substep through the fused
    crowd kernel and field builds through the VMEM integrator; through the
    interpreter (this relay can't compile Mosaic) a small squad must still
    path to its goal."""
    from permafrost_engine_tpu.core.config import EngineConfig, MoveState
    from permafrost_engine_tpu.game.engine import Engine

    monkeypatch.setenv("PFTPU_USE_PALLAS", "1")
    monkeypatch.setenv("PFTPU_PALLAS_INTERPRET", "1")
    cfg = EngineConfig(max_ents=16, chunks_r=1, chunks_c=1, num_layers=1,
                       max_flocks=4, max_projectiles=8,
                       field_slab_slots=8, los_slab_slots=8)
    eng = Engine(cfg)
    rng = np.random.default_rng(0)
    uids = eng.spawn_batch(
        (rng.random((4, 2)) * 30 + 40).astype(np.float32), max_speed=60.0)
    assert eng.move(uids, (200.0, 200.0))
    for _ in range(80):
        eng.step(6)
        if all(eng.movestate_of(u) == MoveState.ARRIVED for u in uids):
            break
    assert all(eng.movestate_of(u) == MoveState.ARRIVED for u in uids)
    for u in uids:
        assert np.linalg.norm(eng.pos_of(u) - np.asarray([200.0, 200.0])) < 40


def test_fused_kernel_avoids_collisions():
    """Behavioural check: two units driven head-on pick velocities that
    keep them apart (the HRVO property, ref: clearpath.c)."""
    pos = np.array([[0.0, 0.0], [4.0, 0.0]], np.float32)
    vel = np.array([[1.0, 0.0], [-1.0, 0.0]], np.float32)
    radius = np.ones(2, np.float32)
    vpref = vel.copy()
    max_speed = np.full(2, 1.0, np.float32)
    cand_pos = np.stack([pos[::-1]], axis=1).reshape(2, 1, 2)
    cand_vel = np.stack([vel[::-1]], axis=1).reshape(2, 1, 2)
    cand_rad = np.ones((2, 1), np.float32)
    cand_valid = np.ones((2, 1), bool)
    cand_static = np.zeros((2, 1), bool)
    out = np.asarray(hrvo_select_pallas(
        *[jnp.asarray(a) for a in (pos, vel, radius, vpref, max_speed,
                                   cand_pos, cand_vel, cand_rad,
                                   cand_valid, cand_static)],
        interpret=True))
    # head-on preferred velocities are infeasible: both deviate laterally
    assert abs(out[0, 1]) > 1e-3 or abs(out[1, 1]) > 1e-3, out
    # and they deviate to compatible sides (no mirrored collision course)
    p0 = pos + out
    assert np.linalg.norm(p0[0] - p0[1]) >= np.linalg.norm(pos[0] - pos[1]) - 2.2
