"""North-star benchmark: sim frames/sec at a 10k-unit battle.

Scenario (the FULL BASELINE config #5: scripts/test_stress.py:46-50 scaled
per the BASELINE.md ladder): two 5000-unit COMBINED-ARMS armies at war on
the 4x4-chunk obstacle map —

  * ground corps (melee + archers + 3x3-footprint siege) ordered via
    move_in_formation(RANK): Hungarian-style cell assignment, per-layer
    subformation blocks, cell-seeded arrival fields;
  * navies (water nav domain) fighting down the river's mid reach;
  * air squadrons (air domain) overflying walls/river/plateau —
    together the {ground, water, air} x footprint nav-layer stack is hot
    for real, not just materialised;
  * SKINNED entities: cfg.skin_joints=32 — the tick rebuilds the full
    [N, 32, 4, 4] pose-palette array (ops/skin.py) every frame at 60 Hz
    inside the measured loop, the anim-texture workload of 10k skinned
    models (ref: src/anim/anim_texture.c:93-145);

with movement (flow fields + boids + ClearPath), combat, projectiles and
fog-of-war all active at reference cadences (move 20 Hz, combat 10 Hz,
projectiles 30 Hz).

The battle is measured in THREE phases, each the median of three 120-frame
windows (median, not best: the TPU sits behind a shared relay with run-to-
run interference, and a median is robust without being generous):

  march   — armies closing, full movement pipeline, combat kernels idle
  contact — the melee: combat + projectiles + corpses + crowding all hot
  late    — after most units are dead (corpse decay, sparse survivors)

The headline `value` is the MINIMUM phase fps — the battle is only a 60 fps
battle if its *worst* phase holds 60.

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
from permafrost_engine_tpu.game.engine import Engine


def build_battle(n_per_side: int = 5000, terrain: bool = False,
                 full: bool = False) -> Engine:
    """`full=False`: the r1-r4 comparable battle (two plain armies, ground
    only, no skinning). `full=True`: the complete BASELINE config #5
    workload — RANK formations, navies on the river, air squadrons, siege
    footprints, and 32-joint device skinning at 60 Hz."""
    # capacity sized to the workload: 10k fighters + projectile headroom
    # (the arena is dense; dead padding costs real VPU work)
    cfg = EngineConfig(max_ents=2 * n_per_side + 256,
                       skin_joints=32 if full else 0)
    eng = Engine(cfg)
    if terrain:
        # 4x4-chunk battle map: choke walls, a river with bridges, a cliff
        # plateau with ramp cuts — A*, portal graphs, field caches and
        # height-aware shadowcast fog are all hot (the reference's
        # defining workload is crowds navigating AROUND things)
        sys.path.insert(0, "/root/repo/tools")
        from mapgen import make_battle_map
        eng.load_map_data(make_battle_map())
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    # compile the batched nav kernels' capped bucket shapes BEFORE the
    # first orders: a mid-fight rebuild storm (and the initial installs)
    # must dispatch into already-compiled shapes, not stall on remote XLA
    # compiles (measured 8-11 s inside one contact window before this)
    eng.prewarm_nav()

    rng = np.random.default_rng(0)

    def block(x0: float, z0: float, n: int, files: int,
              dx: float = 4.0, dz: float = 3.0) -> np.ndarray:
        fx = (np.arange(n) % files) * dx
        fz = (np.arange(n) // files) * dz
        x = x0 + fx + (rng.random(n) - 0.5)
        z = z0 + fz + (rng.random(n) - 0.5)
        return np.stack([x, z], 1).astype(np.float32)

    if not full:
        ranged = (rng.random(n_per_side) < 0.2)
        a = eng.spawn_batch(block(200.0, 212.0, n_per_side, 25), faction=0,
                            max_speed=20.0, is_ranged=ranged,
                            attack_range=np.where(ranged, 40.0, 5.0),
                            vision_range=80.0, hp=200.0)
        b = eng.spawn_batch(block(820.0, 212.0, n_per_side, 25), faction=1,
                            max_speed=20.0, is_ranged=ranged,
                            attack_range=np.where(ranged, 40.0, 5.0),
                            vision_range=80.0, hp=200.0)
        eng.move(a, (820.0, 512.0))
        eng.move(b, (200.0, 512.0))
        return eng

    # ---- BASELINE config #5 composition (per side, n=5000) ------------------
    # ground corps 4360 (melee 3200 + archers 1000 + siege 160 at radius
    # 2.5 -> the 3x3-footprint nav layer), navy 384 (water domain, fights
    # down the river's mid reach between the bridges), air squadron 256.
    from permafrost_engine_tpu.core.config import NavDomain
    from permafrost_engine_tpu.game.formation import FormationType

    n_melee = int(n_per_side * 0.64)
    n_arch = int(n_per_side * 0.20)
    n_siege = int(n_per_side * 0.032)
    n_navy = int(n_per_side * 0.0768)
    n_air = n_per_side - n_melee - n_arch - n_siege - n_navy

    def spawn_side(f: int, x_inf: float, x_siege: float, x_air: float,
                   navy_z0: float) -> dict:
        mirror = f == 1
        inf = eng.spawn_batch(
            block(x_inf, 212.0, n_melee + n_arch, 25), faction=f,
            max_speed=20.0,
            is_ranged=np.arange(n_melee + n_arch) >= n_melee,
            attack_range=np.where(np.arange(n_melee + n_arch) >= n_melee,
                                  40.0, 5.0),
            vision_range=80.0, hp=200.0)
        siege = eng.spawn_batch(
            block(x_siege, 380.0, n_siege, 8, dx=7.0, dz=7.0), faction=f,
            radius=2.5, max_speed=10.0, is_ranged=True, attack_range=50.0,
            base_dmg=30.0, vision_range=90.0, hp=400.0)
        # navy holds the river's mid reach (world x 452-484 between the
        # bridges at z 288-384 and 640-736): 8 files of 4u-spaced hulls
        navy = eng.spawn_batch(
            block(452.0, navy_z0, n_navy, 8), faction=f,
            domain=NavDomain.WATER, radius=1.5, max_speed=24.0,
            is_ranged=True, attack_range=45.0, base_dmg=15.0,
            vision_range=90.0, hp=300.0)
        air = eng.spawn_batch(
            block(x_air, 420.0, n_air, 16), faction=f,
            domain=NavDomain.AIR, radius=1.2, max_speed=32.0,
            is_ranged=True, attack_range=30.0, vision_range=100.0,
            hp=150.0)
        return {"inf": inf, "siege": siege, "navy": navy, "air": air,
                "mirror": mirror}

    a = spawn_side(0, x_inf=200.0, x_siege=160.0, x_air=120.0, navy_z0=400.0)
    b = spawn_side(1, x_inf=820.0, x_siege=930.0, x_air=880.0, navy_z0=560.0)

    # the ground corps march in RANK formation (per-layer subformation
    # blocks + device cell assignment, ref: formation.c:354,450-980);
    # navies cross each other inside the mid reach; air squadrons overfly
    # the map diagonally (the air layer has no obstacles to navigate)
    eng.move_in_formation(a["inf"] + a["siege"], (820.0, 512.0),
                          FormationType.RANK)
    eng.move_in_formation(b["inf"] + b["siege"], (200.0, 512.0),
                          FormationType.RANK)
    eng.move(a["navy"], (468.0, 620.0))
    eng.move(b["navy"], (468.0, 404.0))
    eng.move(a["air"], (900.0, 512.0))
    eng.move(b["air"], (140.0, 512.0))
    return eng


def place_midfight_structures(eng: Engine) -> None:
    """Drop blocking buildings near the battle's choke points MID-FIGHT:
    nav cutouts -> dirty-chunk portal rebuild -> field invalidation ->
    through-chunk replans, all inside the measured windows
    (ref: nav.c:2119-2206 N_Update under churn)."""
    from permafrost_engine_tpu.core.config import EntityFlags

    spots = np.array([[356.0, 280.0], [356.0, 744.0],
                      [470.0, 330.0], [470.0, 700.0],
                      [590.0, 512.0], [420.0, 512.0]], np.float32)
    uids = eng.spawn_batch(
        spots, faction=0, radius=10.0,
        flags=int(EntityFlags.COLLISION | EntityFlags.BUILDING),
        max_speed=0.0, hp=1000.0)
    for u in uids:
        eng.set_structure_blocking(u, True)


def measure_rebuild():
    """Second north star: flow-field rebuild p50 — single-chunk latency and
    batched amortized cost. Measured before the battle allocates so the
    number reflects the kernel, not allocator pressure."""
    from permafrost_engine_tpu.core.config import COST_IMPASSABLE, FIELD_RES
    from permafrost_engine_tpu.ops import flowfield as ff
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    cost = np.ones((1, FIELD_RES, FIELD_RES), np.uint8)
    cost[0, rng.random((FIELD_RES, FIELD_RES)) < 0.15] = COST_IMPASSABLE
    cj = jnp.asarray(cost)
    # distinct seed point per repetition: rules out any caching effects
    seed_list = []
    for k in range(21):
        r, c = rng.integers(4, FIELD_RES - 4, 2)
        cost[0, r, c] = 1
        s = np.zeros_like(cost, bool)
        s[0, r, c] = True
        seed_list.append(jnp.asarray(s))

    def rebuild(s):
        integ = ff.integrate(cj, s)
        return ff.flow_dirs(integ, cj)

    jax.block_until_ready(rebuild(seed_list[0]))  # compile
    times = []
    for s in seed_list:
        t0 = time.perf_counter()
        jax.block_until_ready(rebuild(s))
        times.append((time.perf_counter() - t0) * 1e3)
    p50_single = float(np.median(times))

    # batched build (how the engine actually rebuilds): 64 chunks at once
    costs = np.repeat(cost, 64, axis=0)
    seedsK = np.zeros_like(costs, bool)
    seedsK[np.arange(64), rng.integers(4, 60, 64), rng.integers(4, 60, 64)] = True
    ck, sk = jnp.asarray(costs), jnp.asarray(seedsK)

    def rebuild_k():
        integ = ff.integrate(ck, sk)
        return ff.flow_dirs(integ, ck)

    jax.block_until_ready(rebuild_k())
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(rebuild_k())
    per_chunk = (time.perf_counter() - t0) / 5 / 64 * 1e3
    return p50_single, per_chunk


def measure_rtt_floor(n: int = 21) -> float:
    """Session relay round-trip floor (ms): p50 of a synchronously-awaited
    trivial chained dispatch. Through the shared axon relay the sync
    per-dispatch round trip dominates interactive stepping (~29 ms
    typical) and DRIFTS with relay load — the same code measures 76-98
    fps across sessions. Reporting the floor at bench start and end lets
    round-over-round fps comparisons separate engine changes from relay
    drift (a chained x->f(x) loop is required: block_until_ready alone
    returns at enqueue-queue drain, not device completion)."""
    import jax.numpy as jnp

    @jax.jit
    def bump(x):
        return x + 1.0

    x = jax.block_until_ready(bump(jnp.zeros(())))  # compile
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        x = jax.block_until_ready(bump(x))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def _class_spread(a: dict, b: dict):
    """Worst per-cadence-class p50 disagreement (%) between two
    consecutive profile_tick runs — the attribution's own error bar."""
    worst = None
    for key, ca in (a.get("classes") or {}).items():
        cb = (b.get("classes") or {}).get(key)
        if cb is None or ca["n"] < 6 or cb["n"] < 6:
            continue
        m = (ca["ms_p50"] + cb["ms_p50"]) / 2
        d = abs(ca["ms_p50"] - cb["ms_p50"]) / max(m, 1e-9) * 100
        worst = d if worst is None else max(worst, d)
    return round(worst, 1) if worst is not None else None


def alive_count(eng: Engine) -> int:
    return int(np.asarray(eng.state.ents.alive).sum())


def overlap_fraction(eng: Engine) -> float:
    """Crowd-quality check: fraction of alive units interpenetrating a
    neighbour by more than 50% of the combined radius. Guards against
    avoidance-solver shortcuts that trade correctness for speed (the
    reference's ClearPath keeps units separated; so must ours)."""
    from permafrost_engine_tpu.core.config import CombatState
    live = (np.asarray(eng.state.ents.alive)
            & (np.asarray(eng.state.ents.combatstate) != CombatState.CORPSE))
    pos = np.asarray(eng.state.ents.pos)[live]
    rad = np.asarray(eng.state.ents.radius)[live]
    n = len(pos)
    if n < 2:
        return 0.0
    bad = np.zeros(n, bool)
    block = 2048
    for s in range(0, n, block):
        d = np.linalg.norm(pos[s:s + block, None] - pos[None, :], axis=-1)
        comb = (rad[s:s + block, None] + rad[None, :]) * 0.5
        np.fill_diagonal(d[:, s:s + block], np.inf)
        bad[s:s + block] |= (d < comb).any(axis=1)
    return float(bad.mean())


def measure_phase(eng: Engine, windows: int = 3, frames: int = 120,
                  scan: bool = False) -> float:
    """Median fps over `windows` timed windows.

    scan=False drives `step` — the interactive mode the headline uses
    (micro-batched: frames between host-cadence boundaries fuse into one
    dispatch, bit-identical to per-frame stepping; live tasks or queued
    events fall back to per-frame). scan=True drives `step_scan` — the
    headless-throughput mode (whole windows in segmented device
    dispatches), reported as an aux metric."""
    drive = eng.step_scan if scan else eng.step
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        drive(frames)
        jax.block_until_ready(eng.state.ents.pos)
        vals.append(frames / (time.perf_counter() - t0))
    return float(np.median(vals))


def fast_forward_until(eng: Engine, pred, chunk: int = 300,
                       max_frames: int = 6000) -> int:
    """step_scan in `chunk`-frame windows until pred(alive) or the cap."""
    total = 0
    while total < max_frames:
        eng.step_scan(chunk)
        total += chunk
        if pred(alive_count(eng)):
            break
    return total


def run_battle(terrain: bool, full: bool = False) -> dict:
    """Drive one full battle (flat or obstacle map); returns phase stats."""
    eng = build_battle(terrain=terrain, full=full)
    n0 = alive_count(eng)
    # warmup: compile + first second
    eng.step(60)

    # ---- phase 1: march (armies closing, no contact yet) --------------------
    fps_march = measure_phase(eng)
    alive_march = alive_count(eng)

    # ---- fast-forward to contact (first deaths) ------------------------------
    ff1 = fast_forward_until(eng, lambda a: a < n0)
    # let the melee thicken so the windows measure peak engagement
    eng.step_scan(300)
    if terrain:
        # structures dropped mid-fight: dirty-chunk rebuilds + replans land
        # inside the measured contact windows
        place_midfight_structures(eng)
    fps_contact = measure_phase(eng)
    fps_contact_scan = measure_phase(eng, scan=True)
    alive_contact = alive_count(eng)
    overlap_frac = overlap_fraction(eng)
    # two consecutive probes: per-cadence-class p50s must agree run-to-run
    # (the r3 bench's single mixed-phase p50 didn't measure anything stable)
    tick_stats = eng.profile_tick(60)
    tick_rerun = eng.profile_tick(60)

    # ---- late phase: most of one side dead ------------------------------------
    fast_forward_until(eng, lambda a: a < 0.55 * n0)
    fps_late = measure_phase(eng)
    alive_end = alive_count(eng)

    return {
        "fps_min": min(fps_march, fps_contact, fps_late),
        "fps_march": round(fps_march, 2),
        "fps_contact": round(fps_contact, 2),
        "fps_contact_scan": round(fps_contact_scan, 2),
        "fps_late": round(fps_late, 2),
        "alive_after_march": alive_march,
        "alive_after_contact": alive_contact,
        "overlap_frac_contact": round(overlap_frac, 4),
        "alive_at_end": alive_end,
        "frames_to_contact": 60 + 3 * 120 + ff1,
        "tick_ms_amortized": round(tick_stats.get("ms_mean", 0.0), 3),
        "tick_classes": tick_stats.get("classes"),
        "tick_classes_rerun": tick_rerun.get("classes"),
        "tick_rerun_spread_pct": _class_spread(tick_stats, tick_rerun),
        "tick_flops_upper": tick_stats.get("tick_flops_upper"),
        "tick_hbm_bytes_upper": tick_stats.get("tick_hbm_bytes_upper"),
        "mfu_upper_pct": tick_stats.get("mfu_upper_pct"),
        "nav_stats": {k: v for k, v in eng.nav.stats.items()},
    }


def measure_render(w: int = 1280, h: int = 720, n_ents: int = 1000,
                   frames: int = 12) -> dict:
    """Render-path bench (ref: src/render/, 18.6k LoC + 40 shaders): the
    TPU rasterizer's ms/frame at WxH on the battle-map demo scene —
    terrain splats + foliage + ~1k entity instances + water reflection/
    refraction (mirror re-raster) + light-ortho shadow pass + HUD/overlay
    compositing. render() ends in a synchronous u8 image fetch, so each
    call is a true wall-clock frame (enqueue-only timing is impossible).
    Also measures sim+render co-residency: the 60 Hz sim loop with a
    render every 4th frame (15 Hz presentation, the decimated-cadence
    mode demos use)."""
    from permafrost_engine_tpu.render.camera import Camera
    from permafrost_engine_tpu.render.scene import SceneRenderer

    sys.path.insert(0, "/root/repo/tools")
    from mapgen import make_battle_map

    cfg = EngineConfig(max_ents=n_ents + 64, skin_joints=32)
    eng = Engine(cfg)
    eng.load_map_data(make_battle_map())
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    rng = np.random.default_rng(0)
    half = n_ents // 2
    for f, x0 in ((0, 250.0), (1, 600.0)):
        pos = np.stack([rng.uniform(x0, x0 + 160, half),
                        rng.uniform(300, 700, half)], 1).astype(np.float32)
        uids = eng.spawn_batch(pos, faction=f, max_speed=20.0,
                               vision_range=80.0, hp=200.0)
        eng.move(uids, (850.0 - x0, 512.0))

    cam = Camera()
    cam.pos = np.array([eng.cfg.world_w / 2, 220.0,
                        eng.cfg.world_h / 2 + 180.0])
    cam.pitch, cam.yaw = -50.0, 90.0
    eng.step(30)
    r = SceneRenderer(eng, w=w, h=h, maxi=n_ents,
                      shadows=True, reflections=True)
    t0 = time.perf_counter()
    r.render(cam, faction_pov=0)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(frames):
        eng._frame += 1          # shadow cache keys on the frame counter
        t0 = time.perf_counter()
        r.render(cam, faction_pov=0)
        times.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.median(times))

    t0 = time.perf_counter()
    sim_frames = 60
    for _ in range(sim_frames // 4):
        eng.step(4)
        r.render(cam, faction_pov=0)
    jax.block_until_ready(eng.state.ents.pos)
    combined_fps = sim_frames / (time.perf_counter() - t0)

    return {
        "resolution": f"{w}x{h}",
        "render_ms_p50": round(p50, 1),
        "render_fps": round(1000.0 / p50, 2),
        "render_ms_p90": round(float(np.percentile(times, 90)), 1),
        "sim_plus_render_fps_dec4": round(combined_fps, 2),
        "first_frame_compile_s": round(compile_s, 1),
        "scene": f"battle map, {n_ents} entities, water refl+refr, "
                 "shadows, HUD",
    }


def main():
    rtt_start = measure_rtt_floor()
    rebuild_p50, rebuild_batched = measure_rebuild()
    render = measure_render()

    # headline: the FULL BASELINE config #5 battle on the OBSTACLE map —
    # RANK formations + water/air domains + 32-joint skinning at 60 Hz on
    # top of the walls/river/cliffs/chokes + mid-fight structure churn.
    # The flat-map plain battle is reported alongside for round-over-round
    # comparability (r1-r4 measured that shape).
    obstacle = run_battle(terrain=True, full=True)
    flat = run_battle(terrain=False)
    rtt_end = measure_rtt_floor()

    fps_min = obstacle["fps_min"]
    out = {
        "metric": "sim_fps_10k_skinned_formation_battle_worst_phase",
        "value": round(fps_min, 2),
        "unit": "frames/s (60Hz frames, 10k skinned units, RANK "
                "formations, ground+water+air layers, worst phase, "
                "obstacle map)",
        "vs_baseline": round(fps_min / 60.0, 3),
        "flat_map_worst_phase_fps": round(flat["fps_min"], 2),
        # relay round-trip floor at bench start/end: cross-round fps deltas
        # smaller than the implied dispatch-overhead delta are relay drift,
        # not engine changes (fps_contact_scan is the relay-insensitive
        # throughput number)
        "relay_rtt_floor_ms_start": round(rtt_start, 2),
        "relay_rtt_floor_ms_end": round(rtt_end, 2),
        "obstacle": obstacle,
        "flat": flat,
        "flow_field_rebuild_ms_p50": round(rebuild_p50, 3),
        "flow_field_rebuild_ms_per_chunk_batched": round(rebuild_batched, 3),
        "rebuild_vs_2ms_target": round(2.0 / max(rebuild_p50, 1e-6), 1),
        "render": render,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
