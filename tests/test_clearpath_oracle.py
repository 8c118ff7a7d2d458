"""ClearPath fidelity bound: the TPU solver's rotated-vdes candidate fan
vs a NumPy oracle implementing the reference's EXACT algorithm —
tangent-point cones, true HRVO apexes (RVO-leg x VO-leg intersection),
pairwise ray-ray intersection candidates + vdes projections filtered by
the point-in-combined-region test, nearest-to-vdes selection
(ref: src/game/clearpath.c:130-388, 560-648).

The fan approximation (ops/clearpath.py) differs by construction; these
tests QUANTIFY the divergence instead of asserting qualitative behaviour:
per-entity |v_fan - v_oracle| distributions over randomized crowds, with
asserted bounds. Measured bounds are documented in ROADMAP.md.
"""

import numpy as np
import pytest

EPS = 1e-6


# ---------------------------------------------------------------------------
# the oracle (reference-faithful, velocity space shifted to world space by
# adding ent pos exactly like clearpath.c does)
# ---------------------------------------------------------------------------

def _vo_edges(p_i, p_j, r_i, r_j):
    """Tangent 'edge' directions exactly as compute_vo_edges builds them:
    unit vectors from ent pos to (neighb_pos +/- perp * (r_i + r_j))."""
    d = p_j - p_i
    n = d / max(np.linalg.norm(d), EPS)
    right = np.array([-n[1], n[0]]) * (r_i + r_j)   # BUFFER_RADIUS = 0
    rt = p_j + right - p_i
    lt = p_j - right - p_i
    return (rt / max(np.linalg.norm(rt), EPS),
            lt / max(np.linalg.norm(lt), EPS))


def _line_intersect(p1, d1, p2, d2):
    det = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(det) < EPS:
        return None
    t = ((p2[0] - p1[0]) * d2[1] - (p2[1] - p1[1]) * d2[0]) / det
    return p1 + d1 * t


def _ray_intersect(p1, d1, p2, d2):
    det = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(det) < EPS:
        return None
    t1 = ((p2[0] - p1[0]) * d2[1] - (p2[1] - p1[1]) * d2[0]) / det
    t2 = ((p2[0] - p1[0]) * d1[1] - (p2[1] - p1[1]) * d1[0]) / det
    if t1 < 0.0 or t2 < 0.0:
        return None
    return p1 + d1 * t1


def _hrvo(p_i, v_i, p_j, v_j, r_i, r_j):
    """compute_hrvo: RVO cone with the apex slid to the intersection of the
    nearer RVO leg with the VO's other leg (clearpath.c:176-215)."""
    right, left = _vo_edges(p_i, p_j, r_i, r_j)
    rvo_apex = p_i + (v_i + v_j) * 0.5
    vo_apex = p_i + v_j
    center = left + right
    det = center[0] * v_i[1] - center[1] * v_i[0]
    if det > EPS:        # ent velocity left of the centerline
        apex = _line_intersect(rvo_apex, left, vo_apex, right)
    elif det < -EPS:
        apex = _line_intersect(rvo_apex, right, vo_apex, left)
    else:
        apex = rvo_apex
    if apex is None:
        apex = rvo_apex
    return apex, left, right


def _inside_pcr(rays, test):
    """inside_pcr (clearpath.c:249-296): inside any cone's wedge."""
    for (apex_l, dir_l), (apex_r, dir_r) in zip(rays[0::2], rays[1::2]):
        pt = test - apex_l
        if np.linalg.norm(pt) < EPS:
            continue
        pt = pt / np.linalg.norm(pt)
        left_det = pt[1] * dir_l[0] - pt[0] * dir_l[1]
        if left_det < EPS:      # left of the left edge -> outside this cone
            continue
        pt2 = test - apex_r
        if np.linalg.norm(pt2) < EPS:
            continue
        pt2 = pt2 / np.linalg.norm(pt2)
        right_det = pt2[1] * dir_r[0] - pt2[0] * dir_r[1]
        if right_det > -EPS:    # right of the right edge -> outside
            continue
        return True
    return False


def oracle_new_velocity(pos, vel, radius, i, neigh, des_v):
    """G_ClearPath_NewVelocity for entity i against dynamic neighbours
    (clearpath.c:694 with the remove_furthest retry loop)."""
    neigh = list(neigh)
    while True:
        rays = []
        for j in neigh:
            if np.linalg.norm(pos[j] - pos[i]) < EPS:
                continue
            apex, left, right = _hrvo(pos[i], vel[i], pos[j], vel[j],
                                      radius[i], radius[j])
            rays.append((apex, left))
            rays.append((apex, right))
        if not rays:
            return des_v.copy()
        des_ws = pos[i] + des_v
        if not _inside_pcr(rays, des_ws):
            return des_v.copy()
        xpoints = []
        n = len(rays)
        for a in range(n):
            for b in range(n):
                if a == b:
                    continue
                x = _ray_intersect(rays[a][0], rays[a][1],
                                   rays[b][0], rays[b][1])
                if x is not None and not _inside_pcr(rays, x):
                    xpoints.append(x)
        for apex, d in rays:
            # vdes projected onto each ray AS A FREE VECTOR (the
            # reference projects des_v, not des_v - apex:
            # compute_vdes_proj_points clearpath.c:349-367)
            proj = apex + d * float(np.dot(d, des_v))
            if not _inside_pcr(rays, proj):
                xpoints.append(proj)
        if xpoints:
            local = np.asarray(xpoints) - pos[i]
            k = np.argmin(np.linalg.norm(local - des_v, axis=-1))
            return local[k]
        # no feasible candidate: drop the farthest neighbour and retry
        # (clearpath.c:372-390 remove_furthest loop; empty -> zero)
        if len(neigh) <= 1:
            return np.zeros(2)
        dists = [np.linalg.norm(pos[j] - pos[i]) for j in neigh]
        neigh.pop(int(np.argmax(dists)))


# ---------------------------------------------------------------------------
# harness: run both solvers on randomized crowds
# ---------------------------------------------------------------------------

def _run_pair(seed, n=24, spread=22.0, speed=1.0, k=8, exact=False):
    import jax.numpy as jnp
    from permafrost_engine_tpu.ops.clearpath import new_velocities
    rng = np.random.default_rng(seed)
    pos = (rng.random((n, 2)) - 0.5).astype(np.float32) * spread
    ang = rng.random(n) * 2 * np.pi
    vel = (np.stack([np.cos(ang), np.sin(ang)], -1)
           * speed * rng.random((n, 1))).astype(np.float32)
    radius = np.full(n, 1.0, np.float32)
    dang = rng.random(n) * 2 * np.pi
    vpref = (np.stack([np.cos(dang), np.sin(dang)], -1)
             * speed).astype(np.float32)
    max_speed = np.full(n, speed, np.float32)

    # k nearest neighbours per entity (the engine's knn window)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k].astype(np.int32)
    valid = np.take_along_axis(d, idx, 1) < 16.0

    ours = np.asarray(new_velocities(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(radius),
        jnp.asarray(vpref), jnp.asarray(max_speed), jnp.asarray(idx),
        jnp.asarray(valid), jnp.zeros_like(jnp.asarray(valid)),
        jnp.ones(n, bool), exact=exact))

    oracle = np.stack([
        oracle_new_velocity(pos.astype(np.float64), vel.astype(np.float64),
                            radius, i, idx[i][valid[i]],
                            vpref[i].astype(np.float64))
        for i in range(n)])
    # the oracle picks candidates at unbounded speed; clamp like ours does
    sp = np.linalg.norm(oracle, axis=-1)
    oracle = np.where((sp > speed)[:, None],
                      oracle / np.maximum(sp, EPS)[:, None] * speed, oracle)
    return pos, vel, radius, vpref, ours, oracle, valid


def _divergence_stats(cases=12, **kw):
    divs, flips = [], []
    for seed in range(cases):
        pos, vel, radius, vpref, ours, oracle, valid = _run_pair(seed, **kw)
        speed = float(np.linalg.norm(vpref, axis=-1).max())
        d = np.linalg.norm(ours - oracle, axis=-1) / max(speed, EPS)
        divs.append(d)
        # direction flip: solutions pointing >90deg apart at real speed
        no = np.linalg.norm(oracle, axis=-1)
        nu = np.linalg.norm(ours, axis=-1)
        both = (no > 0.3 * speed) & (nu > 0.3 * speed)
        cosang = np.sum(ours * oracle, -1) / np.maximum(no * nu, EPS)
        flips.append((both & (cosang < 0.0)))
    return np.concatenate(divs), np.concatenate(flips)


def test_fan_matches_oracle_when_unconstrained():
    """Free space: both return vpref exactly."""
    d, _ = _divergence_stats(cases=4, n=8, spread=400.0)
    assert float(np.max(d)) < 1e-3


def test_fan_divergence_bounded_moderate_density():
    """Moderate crowding (24 units in 22u box): the fan's chosen velocity
    stays near the oracle's. Measured (2026-08, 12 seeds x 24 ents):
    median 0.26, p90 0.91 of max speed, direction flips 4.2% — the medians
    overstate disagreement because avoidance is multi-modal (dodging left
    vs right are both valid and far apart in velocity space); the flip
    rate and the feasibility test below are the binding fidelity checks."""
    d, flips = _divergence_stats(cases=12, n=24, spread=22.0)
    assert float(np.median(d)) < 0.35, np.median(d)
    assert float(np.quantile(d, 0.9)) < 1.2, np.quantile(d, 0.9)
    # opposite-direction picks must be rare (measured 4.2%)
    assert float(flips.mean()) < 0.10, flips.mean()


def test_fan_divergence_bounded_high_density():
    """Saturation density (24 units in 12u box, radius-1): divergence grows
    but the solver must not pick wildly different velocities on average.
    Measured (2026-08): median 0.47, flips 12.5%."""
    d, flips = _divergence_stats(cases=8, n=24, spread=12.0)
    assert float(np.median(d)) < 0.6, np.median(d)
    assert float(flips.mean()) < 0.20, flips.mean()


def test_oracle_sanity_head_on():
    """Two units head-on: the oracle itself must sidestep (regression guard
    for the oracle implementation, not the solver)."""
    pos = np.array([[0.0, 0.0], [6.0, 0.0]])
    vel = np.array([[1.0, 0.0], [-1.0, 0.0]])
    radius = np.array([1.0, 1.0])
    des = np.array([1.0, 0.0])
    v = oracle_new_velocity(pos, vel, radius, 0, [1], des)
    assert abs(v[1]) > 1e-3 or v[0] < 0.99   # deflected off pure +x
    # and a clear-path case returns vpref untouched
    pos2 = np.array([[0.0, 0.0], [0.0, 30.0]])
    v2 = oracle_new_velocity(pos2, vel, radius, 0, [1], des)
    assert np.allclose(v2, des)


@pytest.mark.parametrize("seed", [3, 7])
def test_fan_solution_feasibility_vs_oracle_cones(seed):
    """When the fan picks a velocity, it must be feasible (outside the
    oracle's exact combined region) about as often as the oracle's own
    pick — the approximation may move differently but must not routinely
    choose colliding velocities the exact method would avoid."""
    pos, vel, radius, vpref, ours, oracle, valid = _run_pair(seed)
    n = len(pos)
    ours_ok = oracle_ok = considered = 0
    for i in range(n):
        neigh = np.nonzero(valid[i])[0]
        rays = []
        for jj in neigh:
            j = int(jj)
            apex, left, right = _hrvo(pos[i], vel[i], pos[j], vel[j],
                                      radius[i], radius[j])
            rays.append((apex, left))
            rays.append((apex, right))
        if not rays:
            continue
        considered += 1
        ours_ok += not _inside_pcr(rays, pos[i] + ours[i])
        oracle_ok += not _inside_pcr(rays, pos[i] + oracle[i])
    assert considered > 0
    # allow a modest feasibility gap vs the exact method
    assert ours_ok >= oracle_ok - max(2, int(0.25 * considered)), \
        (ours_ok, oracle_ok, considered)


# ---------------------------------------------------------------------------
# exact mode (cfg.clearpath_exact, the engine default): reference-exact
# geometry — tangent-point edges, true HRVO apexes, pairwise ray-ray
# intersection candidates, the inside_pcr wedge test with EPSILON=1/1024,
# and the remove-furthest retry as a prefix-feasibility cascade
# ---------------------------------------------------------------------------


def _divergence_stats_exact(cases=12, **kw):
    divs, flips = [], []
    for seed in range(cases):
        pos, vel, radius, vpref, ours, oracle, valid = _run_pair(
            seed, exact=True, **kw)
        speed = float(np.linalg.norm(vpref, axis=-1).max())
        d = np.linalg.norm(ours - oracle, axis=-1) / max(speed, EPS)
        divs.append(d)
        no = np.linalg.norm(oracle, axis=-1)
        nu = np.linalg.norm(ours, axis=-1)
        both = (no > 0.3 * speed) & (nu > 0.3 * speed)
        cosang = np.sum(ours * oracle, -1) / np.maximum(no * nu, EPS)
        flips.append((both & (cosang < 0.0)))
    return np.concatenate(divs), np.concatenate(flips)


def test_exact_matches_oracle_moderate_density():
    """Exact mode reproduces the oracle's picks at moderate density.
    Measured (2026-08, 12 seeds x 24 ents): median 0.000, p90 0.253,
    flips 0.0% — vs the fan's median 0.26 / p90 0.91 / 4.2%."""
    d, flips = _divergence_stats_exact(cases=12, n=24, spread=22.0)
    assert float(np.median(d)) < 0.05, np.median(d)
    assert float(np.quantile(d, 0.9)) < 0.4, np.quantile(d, 0.9)
    assert float(flips.mean()) < 0.02, flips.mean()


def test_exact_matches_oracle_saturated():
    """Saturation density: measured median 0.000, p90 0.233, flips 0.5%
    (vs the fan's 0.47 / 1.16 / 12.5%) — the verdict's acceptance bar was
    flips <= 5% and p90 <= 0.4."""
    d, flips = _divergence_stats_exact(cases=8, n=24, spread=12.0)
    assert float(np.median(d)) < 0.05, np.median(d)
    assert float(np.quantile(d, 0.9)) < 0.4, np.quantile(d, 0.9)
    assert float(flips.mean()) < 0.05, flips.mean()
