"""The jitted simulation tick.

The reference's frame loop is event-driven at decimated rates: a 60 Hz
timer derives 30/20/10/5/1 Hz events consumed by movement, combat and
projectile handlers (ref: src/game/timer_events.c:107-122,
movement.c:4415, combat.c:1836). Here the whole thing is ONE pure jitted
function over GameState: `tick` increments the 60 Hz counter and
`lax.cond`-gates each subsystem on its divisor, reproducing the cadence
semantics with zero host round-trips.

Movement substep = the reference's move_do_tick pipeline
(ref: movement.c:4312-4413) fused into array ops:
  spatial grid build -> knn -> flow-field sample -> boids vpref ->
  ClearPath solve -> integration/state machine -> blocker restamp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    ARRIVE_SLOWING_RADIUS,
    CONTACT_CELL_SIZE,
    EngineConfig,
    EntityFlags,
    FRAME_HZ,
    MAX_NEIGHBOURS,
    MoveState,
    NAV_TILE_SIZE,
)
from permafrost_engine_tpu.ops import boids, clearpath, grid
from permafrost_engine_tpu.ops import combat as combat_ops
from permafrost_engine_tpu.ops import fog as fog_ops
from permafrost_engine_tpu.ops import integrate as integ_ops
from permafrost_engine_tpu.ops import projectile as proj_ops
from permafrost_engine_tpu.ops import velocity as vel_ops
from permafrost_engine_tpu.state.schema import GameState, TickDeltas, empty_deltas


def _restamp_blockers(cfg: EngineConfig, ents, nav):
    """Dense blocker rebuild: stationary collidable ground entities stamp
    their nav tile (ref: N_BlockersIncref, nav.c:4663 — the reference
    increments/decrements; a full restamp is equivalent each movement tick
    and trivially parallel). Footprint layers see the stamp dilated: a 3x3
    unit cannot pass within one tile of a blocker (the radius-dependent
    stamps of N_BlockersIncrefOBB)."""
    from permafrost_engine_tpu.core.config import FOOTPRINTS, NUM_FOOTPRINTS

    h, w = cfg.field_h, cfg.field_w
    stationary = (
        ents.alive
        & ((ents.flags & jnp.uint32(EntityFlags.COLLISION)) != 0)
        & ((ents.flags & jnp.uint32(EntityFlags.AIR)) == 0)
        & (ents.movestate == MoveState.ARRIVED)
    )
    c = jnp.clip((ents.pos[:, 0] / NAV_TILE_SIZE).astype(jnp.int32), 0, w - 1)
    r = jnp.clip((ents.pos[:, 1] / NAV_TILE_SIZE).astype(jnp.int32), 0, h - 1)
    flat = jnp.where(stationary, r * w + c, h * w)
    counts = jnp.zeros((h * w,), jnp.int32).at[flat].add(
        1, mode="drop").reshape(1, h, w)

    # separable max filters: each footprint reuses the previous one's
    # dilation (1 -> 3 -> 5 -> 7 via repeated 3-wide passes), so the whole
    # stack costs six 1-D reduce_windows instead of dense 2-D ones
    def grow(x):
        x = jax.lax.reduce_window(
            x, 0, jax.lax.max, (3, 1), (1, 1), "SAME")
        return jax.lax.reduce_window(
            x, 0, jax.lax.max, (1, 3), (1, 1), "SAME")

    per_fp = [counts[0]]
    for _ in range(min(NUM_FOOTPRINTS, cfg.num_layers) - 1):
        per_fp.append(grow(per_fp[-1]))
    fp_stack = jnp.stack(per_fp)                      # [<=4, h, w]
    reps = -(-cfg.num_layers // fp_stack.shape[0])
    blockers = jnp.tile(fp_stack, (reps, 1, 1))[:cfg.num_layers]
    return nav.replace(blockers=blockers)


def movement_substep(cfg: EngineConfig, state: GameState, deltas: TickDeltas,
                     crowd_kernel=None):
    ents = state.ents
    n = cfg.max_ents

    moving_mask = ents.alive & (
        (ents.movestate == MoveState.MOVING)
        | (ents.movestate == MoveState.TURNING)
        | (ents.movestate == MoveState.SEEK_ENEMIES)
        | (ents.movestate == MoveState.ARRIVING_TO_CELL)
        | (ents.movestate == MoveState.SURROUND_ENTITY)
    ) & ((ents.flags & jnp.uint32(EntityFlags.MOVABLE)) != 0)

    # ---- spatial index + neighbours (ref: movement.c:2768-2830) ------------
    # Both crowd backends share the payload-carrying grid: neighbour
    # attributes (vel/radius/static/flock/arrived) ride the bucket payload
    # channels, so no per-neighbour arena gathers are needed (TPU element
    # gathers run ~1 elem/cycle), and boids works over the FULL candidate
    # window as masked sums — no top-k.
    #
    # The window is 3x3 cells (>=16u guaranteed reach): every per-pair
    # consumer's horizon fits — HRVO cones never bind past 16u at <=1u/tick
    # speeds, alignment/arrival-propagation cut off at 10u, and
    # separation's 16-30u tail is <=1/256-weight noise (1/d^2 falloff).
    # Cohesion — the one force that genuinely needs ~50u — leaves the
    # window entirely: `flock_cohesion_centroids` factorizes it into
    # per-(flock, cell) scatter-sums + a 7x7-cell box filter, reaching
    # 48-64u (vs the old 5x5 window's ~32u cap against the reference's
    # 50u constant) with no bucket-cap truncation. This halves the wide
    # window gather ([N, 400, 9ch] -> [N, 144, 9ch]) that dominated the
    # movement tick (~1.9 ms/frame by ablation).
    collidable = ents.alive & ((ents.flags & jnp.uint32(EntityFlags.COLLISION)) != 0)
    slots = jnp.arange(n, dtype=jnp.int32)
    ent_static = (
        ((ents.flags & jnp.uint32(EntityFlags.MOVABLE)) == 0)
        | (ents.movestate == MoveState.ARRIVED))
    payload = jnp.concatenate([
        ents.vel,                                           # 0:2
        ents.radius[:, None],                               # 2
        ent_static.astype(jnp.float32)[:, None],            # 3
        ents.flock.astype(jnp.float32)[:, None],            # 4
        (ents.movestate == MoveState.ARRIVED
         ).astype(jnp.float32)[:, None],                    # 5
    ], axis=1)
    # the fine CONTACT grid (used by de-penetration below) shares this
    # build: one composite-key argsort yields both grids' bucket ranks
    sgrid, cgrid = grid.build_grid_pair(
        ents.pos, collidable,
        cells_r=cfg.grid_cells_r, cells_c=cfg.grid_cells_c,
        cap=cfg.spatial_cell_cap, payload=payload,
        fine_r=cfg.contact_cells_r, fine_c=cfg.contact_cells_c,
        fine_cap=cfg.contact_cell_cap, fine_payload=ents.radius[:, None],
        fine_cell_size=CONTACT_CELL_SIZE)
    cand, cpos, cpay, cvalid = grid.window_candidates(
        sgrid, ents.pos, slots, window=3)
    neigh_idx, neigh_valid, neigh_pos = cand, cvalid, cpos
    neigh_dist = jnp.linalg.norm(cpos - ents.pos[:, None, :], axis=-1)
    neigh_vel = cpay[..., 0:2]
    neigh_rad = cpay[..., 2]
    neigh_static = cpay[..., 3] > 0.5
    neigh_flock = cpay[..., 4].astype(jnp.int32)
    neigh_arrived = cpay[..., 5] > 0.5

    # ---- desired velocity (ref: movement.c:4166, nav.c:3468) ----------------
    # combat chasers (MOVING_TO_TARGET, no flock) route through their
    # faction's enemy-seek field instead of straight-lining into walls
    # (ref: field.c:1209-1678 enemy-seek velocity)
    from permafrost_engine_tpu.core.config import CombatState

    chasing = ents.alive & (ents.combatstate == CombatState.MOVING_TO_TARGET)
    # chase fields are built per (faction, layer): big/water chasers follow
    # fields integrated on THEIR layer's dilated costs (ref: field.c:1209-
    # 1678 per-layer enemy-seek). Flat take over the tiny [F, L] table —
    # paired 2-D indexing would lower to the same element gather, the flat
    # form keeps it explicit.
    chase_flat = state.factions.chase_slot.reshape(-1)
    ent_gslot = jnp.where(
        chasing,
        chase_flat[
            jnp.clip(ents.faction, 0, cfg.max_factions - 1) * cfg.num_layers
            + jnp.clip(ents.layer, 0, cfg.num_layers - 1)],
        -1)
    flow_dir, has_field = vel_ops.flow_velocity(
        ents.pos, ents.flock, state.flocks.field_slot, state.fields.flow,
        state.flocks.global_slot, state.fields.global_flow, ent_gslot,
        chunks_r=cfg.chunks_r, chunks_c=cfg.chunks_c)
    dist_dest = jnp.linalg.norm(ents.dest - ents.pos, axis=-1)
    # direct-seek when close, when no field exists, or when the unit has
    # line-of-sight to the destination (ref: LOS latch, movement.c:4129).
    # Chasers are exempt from the close-range override: their enemy-seek
    # field converges on the target itself, and direct steering near a
    # wall would wedge them against it.
    has_los = vel_ops.dest_los(
        ents.pos, ents.flock, state.flocks.los_slot, state.fields.los,
        chunks_r=cfg.chunks_r, chunks_c=cfg.chunks_c)
    use_arrive = ~has_field | has_los | (
        (dist_dest < 4 * ARRIVE_SLOWING_RADIUS) & ~chasing)

    max_speed_tick = ents.max_speed / float(cfg.move_hz)
    coh_centroid, coh_cnt = boids.flock_cohesion_centroids(
        ents.pos, ents.flock, collidable,
        cells_r=cfg.grid_cells_r, cells_c=cfg.grid_cells_c,
        cell_size=sgrid.cell_size, max_flocks=cfg.max_flocks)
    vpref = boids.preferred_velocity(
        ents.pos, ents.vel, ents.flock, ents.dest, flow_dir, use_arrive,
        max_speed_tick, neigh_idx, neigh_valid, moving_mask,
        neigh_pos=neigh_pos, neigh_vel=neigh_vel, neigh_flock=neigh_flock,
        formation_cell=ents.formation_cell,
        has_cell=ents.has_formation_cell,
        flock_formation=state.flocks.formation, max_flocks=cfg.max_flocks,
        coh_centroid=coh_centroid, coh_cnt=coh_cnt)

    # ---- HRVO solve (ref: clearpath.c:694) -----------------------------------
    if crowd_kernel is not None:
        # fused kernel: exact top-K + cones + pick in VMEM
        raw = crowd_kernel(
            ents.pos, ents.vel, ents.radius, vpref, max_speed_tick,
            neigh_pos, neigh_vel, neigh_rad, neigh_valid, neigh_static)
        new_vel = jnp.where(moving_mask[:, None], raw, vpref)
    else:
        # top-K nearest cones over the (already 3x3) window: collision
        # cones from neighbours >16u away never bind at <=1u/tick speeds
        d2c = jnp.sum((cpos - ents.pos[:, None, :]) ** 2, axis=-1)
        d2c = jnp.where(cvalid, d2c, jnp.inf)
        neg_d2, ti = jax.lax.approx_max_k(
            -d2c, MAX_NEIGHBOURS, recall_target=0.95, aggregate_to_topk=True)

        # extract the top-K subset with ONE gather of packed 6-float rows
        # (six separate take_along_axis calls are six per-element gather
        # passes; packed, each fetch moves a contiguous 24-byte unit)
        pack = jnp.concatenate([
            cpos,                                             # 0:2
            neigh_vel,                                        # 2:4
            neigh_rad[..., None],                             # 4
            neigh_static[..., None].astype(jnp.float32),      # 5
        ], axis=-1)
        sub = jnp.take_along_axis(pack, ti[..., None], axis=1)  # [N,K,6]

        # ti (window-local indices) stands in for neigh_idx: with every
        # payload channel supplied, new_velocities never dereferences the
        # arena by index — it only takes the [N,K] shape from it
        new_vel = clearpath.new_velocities(
            ents.pos, ents.vel, ents.radius, vpref, max_speed_tick,
            ti, jnp.isfinite(neg_d2), sub[..., 5] > 0.5, moving_mask,
            neigh_pos=sub[..., 0:2], neigh_vel=sub[..., 2:4],
            neigh_rad=sub[..., 4], exact=cfg.clearpath_exact)

    # ---- integration + FSM (ref: movement.c:2303-2421) -----------------------
    garrisoned = (ents.flags & jnp.uint32(EntityFlags.GARRISONED)) != 0
    # group-arrival propagation: an adjacent same-flock neighbour already
    # ARRIVED lets this entity settle too (see ops/integrate.py)
    neigh_same_flock = (
        neigh_valid
        & (neigh_flock == ents.flock[:, None])
        & (ents.flock[:, None] >= 0)
    )
    flock_arrived = jnp.any(
        neigh_same_flock & neigh_arrived & (neigh_dist < 10.0), axis=1)

    # ---- de-penetration pushout (crowd quality) -----------------------------
    # Units overlapping a neighbour by >10% of the combined radius get a
    # capped positional correction away from it — HRVO's least-violating
    # fallback admits interpenetration under choke pressure, and
    # stationary melee crowds otherwise stay stacked (the bench's
    # overlap_frac guard; ref: clearpath.c keeps units separated via hard
    # VO feasibility). Tangent-packed crowds (dist ~= combined radius)
    # sit in the deadzone and do not jiggle.
    #
    # Contacts come from a FINE 4u-cell grid, not the 16u avoidance grid:
    # a 16u cell tangent-packs ~74 radius-1 units vs bucket cap 16, so at
    # choke density most of the crowd fell out of the coarse index and
    # was invisible to contact resolution (bench overlap_frac hit 0.42 on
    # the obstacle map while a 512-unit battle — no saturation — showed
    # 0.000). A 4u cell fits ~5 tangent-packed units, so the same cap
    # physically cannot saturate.
    _, kpos, kpay, kvalid = grid.contact_candidates(cgrid, ents.pos, slots)
    kdist = jnp.linalg.norm(kpos - ents.pos[:, None, :], axis=-1)
    krad = kpay[..., 0]
    over = (ents.radius[:, None] + krad) * 0.9 - kdist
    over = jnp.where(kvalid & (over > 0.0), over, 0.0)
    away = ((ents.pos[:, None, :] - kpos)
            / jnp.maximum(kdist, 1e-3)[..., None])
    push = jnp.sum(away * (0.5 * over)[..., None], axis=1)        # [N,2]
    pmag = jnp.linalg.norm(push, axis=-1, keepdims=True)
    _DEPEN_CAP = 0.25                        # world units per move tick
    push = jnp.where(pmag > _DEPEN_CAP,
                     push * (_DEPEN_CAP / jnp.maximum(pmag, 1e-6)), push)
    depen_ok = (
        ents.alive
        & ((ents.flags & jnp.uint32(EntityFlags.MOVABLE)) != 0)
        & ~garrisoned
        & (ents.combatstate != CombatState.CORPSE))
    depen = jnp.where(depen_ok[:, None], push, 0.0)

    # ---- contact velocity projection ----------------------------------------
    # Already-overlapping units never keep APPROACHING a contact: for the
    # 4 deepest overlaps, sequentially remove the velocity component
    # pressing into each contact normal (Gauss-Seidel over unit-unit
    # contacts), keeping tangential flow so queues at chokes still move.
    # The reference's ClearPath guarantees non-approach via hard VO
    # feasibility (clearpath.c:388); our least-violating fallback admits
    # approach under pressure, and the capped pushout alone loses the
    # race. Per-contact — NOT the aggregate pushout direction: for an
    # interior unit squeezed from all sides the aggregate cancels to
    # noise and constrains nothing.
    c_depth = jnp.where(
        kvalid,
        (ents.radius[:, None] + krad) * 0.9 - kdist,
        -jnp.inf)                                          # [N, 9*cap]
    c_top, c_idx = jax.lax.top_k(c_depth, 4)               # deepest contacts
    c_n = jnp.take_along_axis(away, c_idx[..., None], axis=1)  # [N, 4, 2]
    for ci in range(4):
        n_i = c_n[:, ci, :]
        vn = jnp.sum(new_vel * n_i, axis=-1, keepdims=True)
        new_vel = jnp.where(
            (c_top[:, ci:ci + 1] > 0.0) & (vn < 0.0) & depen_ok[:, None],
            new_vel - vn * n_i, new_vel)

    upd = integ_ops.movement_update(
        alive=ents.alive,
        moving_mask=moving_mask,
        pos=ents.pos,
        new_vel=new_vel,
        dest=ents.dest,
        movestate=ents.movestate,
        facing=ents.facing,
        vel_hist=ents.vel_hist,
        vel_hist_idx=ents.vel_hist_idx,
        wait_ticks=ents.wait_ticks,
        stuck_ticks=ents.stuck_ticks,
        layer=ents.layer,
        cost_base=state.nav.cost_base,
        blockers=state.nav.blockers,
        garrisoned=garrisoned,
        flock_arrived=flock_arrived,
        has_cell=ents.has_formation_cell,
        depen=depen,
    )
    arrived = upd.pop("arrived")
    new_ents = ents.replace(prev_pos=ents.pos, **upd)
    new_nav = _restamp_blockers(cfg, new_ents, state.nav)

    return (
        state.replace(ents=new_ents, nav=new_nav),
        deltas.replace(arrived=deltas.arrived | arrived),
    )


def combat_substep(cfg: EngineConfig, state: GameState, deltas: TickDeltas):
    state, deltas, attack_now = combat_ops.combat_substep(cfg, state, deltas)
    # ranged attackers loose a projectile at their target's current position
    ents = state.ents
    shooter = attack_now & ents.is_ranged
    ti = jnp.clip(ents.target, 0, cfg.max_ents - 1)
    proj = proj_ops.spawn_projectiles(
        cfg, state.projectiles, shooter, ents.pos, ents.pos[ti],
        ents.faction, ents.base_dmg)
    return state.replace(projectiles=proj), deltas


def fog_substep(cfg: EngineConfig, state: GameState,
                tile_height: jax.Array | None = None):
    ents = state.ents
    new_fog = fog_ops.update_fog(
        state.fog.state, state.fog.enabled,
        ents.pos, ents.alive & (ents.hp > 0.0), ents.faction,
        ents.vision_range, tile_height,
        tiles_h=cfg.tiles_h, tiles_w=cfg.tiles_w,
        max_factions=cfg.max_factions)
    return state.replace(fog=state.fog.replace(state=new_fog))


def make_tick(cfg: EngineConfig, tile_height=None, donate: bool = True,
              skin_bank=None):
    """Build the jitted 60 Hz tick: (state, acc) -> (state, acc').

    `acc` is the running TickDeltas accumulator: the tick folds this
    frame's events into it ON DEVICE, so the host loop is exactly one
    dispatch per frame (a separate per-frame merge dispatch measured
    ~2 ms/frame of host overhead through the remote transport). The
    engine swaps the accumulator for a fresh empty one at each drain
    boundary.

    `tile_height` (f32[tiles_h, tiles_w] or None) enables height-aware fog.
    `skin_bank` (ops/skin.SkinBank, requires cfg.skin_joints > 0) enables
    the render-cadence skinning stage: clip FSM clocks + the full
    [N, J, 4, 4] palette rebuild on device each cfg.skin_hz frame (the
    reference re-bakes its anim texture per rendered frame,
    src/anim/anim_texture.c:93-145).
    `donate=False` for callers that re-invoke the tick on the SAME state
    object (compile checks, sharding wrappers); the engine always rebinds,
    so it donates both arguments.

    Subsystem cadences reproduce the reference's decimated event rates
    (movement 20 Hz, combat 10 Hz, projectiles 30 Hz, corpses 1 Hz —
    ref: timer_events.c:107-122, movement.h:45-50, combat.h:48-53,
    projectile.c:560)."""
    move_period = FRAME_HZ // cfg.move_hz
    combat_period = FRAME_HZ // cfg.combat_hz
    proj_period = FRAME_HZ // 30
    fog_period = max(FRAME_HZ // cfg.fog_hz, 1)
    corpse_period = FRAME_HZ  # 1 Hz

    from permafrost_engine_tpu.ops.crowd_pallas import select_crowd_backend
    crowd_kernel = select_crowd_backend(exact=cfg.clearpath_exact)

    def move_fn(c, s, d):
        return movement_substep(c, s, d, crowd_kernel)

    def gate(pred, fn, state, deltas):
        return jax.lax.cond(
            pred, lambda args: fn(cfg, *args), lambda args: args,
            (state, deltas))

    # donation lets XLA update the state pytree in place (HBM alias) rather
    # than allocating a fresh ~N-leaf copy every frame; the engine always
    # rebinds self.state to the result, so the consumed input is never read
    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def tick(state: GameState, acc: TickDeltas):
        deltas = empty_deltas(cfg)
        t = state.tick + 1
        state = state.replace(tick=t)

        state, deltas = gate(t % move_period == 0,
                             move_fn, state, deltas)
        state, deltas = gate(t % combat_period == 0,
                             combat_substep, state, deltas)
        state, deltas = gate(t % proj_period == 0,
                             proj_ops.projectile_substep, state, deltas)

        def run_corpse(args):
            s, d = args
            s, d, expired = combat_ops.corpse_substep(cfg, s, d)
            return s, d.replace(corpse_expired=d.corpse_expired | expired)

        state, deltas = jax.lax.cond(
            t % corpse_period == 0, run_corpse, lambda args: args,
            (state, deltas))

        state = jax.lax.cond(
            t % fog_period == 0,
            lambda s: fog_substep(cfg, s, tile_height), lambda s: s, state)

        if skin_bank is not None and cfg.skin_joints > 0:
            from permafrost_engine_tpu.ops.skin import skin_substep
            skin_period = max(FRAME_HZ // cfg.skin_hz, 1)
            state = jax.lax.cond(
                t % skin_period == 0,
                lambda s: skin_substep(cfg, skin_bank, s), lambda s: s,
                state)

        return state, merge_deltas(acc, deltas)

    return tick


@jax.jit
def merge_deltas(a: TickDeltas, b: TickDeltas) -> TickDeltas:
    """Fold two tick deltas, `b` the newer (device-side accumulation).

    Event masks OR; the projectile-hit record (target, shooter, cookie)
    merges as ONE unit keyed on the newer window's hit — independent
    element-wise maxes would pair one hit's target with another's shooter
    when a pool slot is reused within a drain window."""
    hit_b = b.proj_hit >= 0
    return TickDeltas(
        arrived=a.arrived | b.arrived,
        motion_start=a.motion_start | b.motion_start,
        died=a.died | b.died,
        attack_started=a.attack_started | b.attack_started,
        proj_hit=jnp.where(hit_b, b.proj_hit, a.proj_hit),
        proj_hit_shooter=jnp.where(hit_b, b.proj_hit_shooter,
                                   a.proj_hit_shooter),
        proj_hit_cookie=jnp.where(hit_b, b.proj_hit_cookie,
                                  a.proj_hit_cookie),
        corpse_expired=a.corpse_expired | b.corpse_expired,
    )


def make_tick_scan(cfg: EngineConfig, tile_height=None, skin_bank=None):
    """Batched frame stepper: run `n` 60 Hz frames in ONE device dispatch
    via lax.scan, returning the final state and deltas merged across the
    window. This is the production driving mode — the host only syncs with
    the device once per window, the TPU analogue of the reference's
    sim/render pipeline overlap (ref: src/main.c:816-889)."""
    tick = make_tick(cfg, tile_height, skin_bank=skin_bank)

    cfg_ref = cfg

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def step_n(state: GameState, n: int):
        # the tick itself folds each frame's events into the accumulator
        # (merge_deltas inside, so the projectile triple merges jointly —
        # a stacked per-field max would mismatch target/shooter/cookie
        # when a pool slot is reused mid-window)
        def body(carry, _):
            return tick(*carry), None

        (state, ds), _ = jax.lax.scan(
            body, (state, empty_deltas(cfg_ref)), None, length=n)
        return state, ds

    return step_n
