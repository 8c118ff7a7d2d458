"""SoA game-state schema: fixed-capacity device arrays as pytrees.

The reference keeps per-entity state in uid-keyed hash tables
(ref: src/game/movement.c:397, src/game/game.c:116-118) mutated in place by
fiber tasks. Here the whole simulation state is one immutable pytree of
fixed-shape arrays in HBM, and a tick is a pure function
``(state) -> (state', deltas)``. Host-side code maps UIDs to arena slots
(``Engine.uid_to_slot``) and issues commands by functionally patching small
slices between ticks — the reference's command-queue discipline
(ref: src/game/movement.c:371-395).

Shapes are fixed by :class:`~permafrost_engine_tpu.core.config.EngineConfig`;
the `alive` mask (and per-subsystem masks) give dynamic membership without
dynamic shapes, which keeps everything XLA-compilable.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import (
    EngineConfig,
    FIELD_RES,
    VEL_HIST_LEN,
)


@flax.struct.dataclass
class EntityArena:
    """SoA entity arrays, capacity ``cfg.max_ents``.

    Replaces the reference's khash-per-subsystem design with one dense
    arena; subsystem membership is encoded in `flags` and per-field
    sentinels (e.g. ``flock == -1``).
    """

    # -- identity / liveness ------------------------------------------------
    alive: jax.Array          # bool[N]
    uid: jax.Array            # i32[N] host-assigned unique id (0 = unused)
    flags: jax.Array          # u32[N] EntityFlags bitmask
    faction: jax.Array        # i32[N]
    layer: jax.Array          # i32[N] nav layer (domain x footprint)

    # -- transform ----------------------------------------------------------
    pos: jax.Array            # f32[N,2] world (x, z)
    height: jax.Array         # f32[N]   world y
    prev_pos: jax.Array       # f32[N,2] previous tick position (render lerp)
    facing: jax.Array         # f32[N]   yaw radians
    radius: jax.Array         # f32[N]   physical/nav radius
    sel_radius: jax.Array     # f32[N]   selection/hit radius

    # -- movement (ref: src/game/movement.c:146-205) --------------------------
    movestate: jax.Array      # i32[N] MoveState
    vel: jax.Array            # f32[N,2] per-movement-tick displacement
    max_speed: jax.Array      # f32[N] world units / second
    dest: jax.Array           # f32[N,2] current destination point
    flock: jax.Array          # i32[N] flock index or -1
    vel_hist: jax.Array       # f32[N,H,2] velocity history ring
    vel_hist_idx: jax.Array   # i32[N] ring write cursor
    wait_ticks: jax.Array     # i32[N] remaining WAITING ticks
    stuck_ticks: jax.Array    # i32[N] consecutive no-progress move ticks
    formation_cell: jax.Array  # f32[N,2] assigned formation cell position
    has_formation_cell: jax.Array  # bool[N]

    # -- combat (ref: src/game/combat.c:142-175) ------------------------------
    hp: jax.Array             # f32[N]
    max_hp: jax.Array         # f32[N]
    combatstate: jax.Array    # i32[N] CombatState
    stance: jax.Array         # i32[N] CombatStance
    target: jax.Array         # i32[N] target arena slot or -1
    attack_range: jax.Array   # f32[N]
    base_dmg: jax.Array       # f32[N]
    armour_pc: jax.Array      # f32[N] damage reduction in [0,1]
    attack_cooldown: jax.Array  # i32[N] combat ticks until next attack
    attack_period: jax.Array    # i32[N] combat ticks between attacks
    is_ranged: jax.Array      # bool[N]
    corpse_ticks: jax.Array   # i32[N] 1Hz countdown while CORPSE
    vision_range: jax.Array   # f32[N] fog-of-war vision radius


@flax.struct.dataclass
class FlockTable:
    """Movement groups keyed by destination (ref: src/game/movement.c:207-213).

    ``field_slot[f, chunk]`` maps a flock's destination to the flow-field
    slab slot holding that chunk's field (-1 = not yet built; entities fall
    back to direct seek until the host builds it) — the device half of the
    reference's dest->fieldcache mapping (ref: src/navigation/fieldcache.h).
    """

    active: jax.Array        # bool[F]
    dest: jax.Array          # f32[F,2] destination point
    layer: jax.Array         # i32[F]
    target_ent: jax.Array    # i32[F] surround/seek target slot or -1
    field_slot: jax.Array    # i32[F, num_chunks] flow slab slot per chunk
    los_slot: jax.Array      # i32[F, num_chunks] LOS slab slot per chunk
    global_slot: jax.Array   # i32[F] whole-map field slot (enemy-seek /
                             # surround, ref: field.h TARGET_ENEMIES/ENTITY)
    formation: jax.Array     # i32[F] FormationType (0 = none): gates the
                             # formation keep/drag forces so plain ring-slot
                             # moves don't get them (ref: formation.h types)


@flax.struct.dataclass
class FieldSlab:
    """Device-resident flow/LOS field storage.

    Host-side LRU bookkeeping (nav/fieldcache.py) assigns slots; the device
    only ever gathers from the slab. Flow directions are the reference's
    9-value quantization (FlowDir) stored one byte per nav tile
    (ref: src/navigation/public/field.h:103-109).
    """

    flow: jax.Array          # u8[S, FIELD_RES, FIELD_RES] FlowDir codes
    los: jax.Array           # u8[S2, FIELD_RES, FIELD_RES] 1 = line-of-sight
    global_flow: jax.Array   # u8[G, H, W] whole-map fields (enemy-seek etc.)


@flax.struct.dataclass
class NavState:
    """Per-layer nav grids, dense over the whole map.

    The reference stores these per-chunk (ref: src/navigation/nav_data.h:
    118-158); dense global arrays with chunk-strided views are the
    TPU-friendly equivalent. `cost_base` folds in static terrain cost;
    `blockers` are dynamic refcounts stamped by stationary entities.
    """

    cost_base: jax.Array     # u8[L, H, W]  effective static cost (terrain +
                             # structure cutouts, ref: N_CutoutStaticObject
                             # nav.c:3326); 0xFF = impassable. Host-side
                             # dirty-chunk tracking lives in NavService.
    blockers: jax.Array      # i32[L, H, W] refcounts
    islands: jax.Array       # i32[L, H, W] global connected-component ids


@flax.struct.dataclass
class FogState:
    """Per-faction fog-of-war at map-tile resolution.

    The reference packs 2 bits/faction into a u32 per tile
    (ref: src/game/fog_of_war.c:163-177); we store one u8 per
    (faction, tile) — same information, vector-friendly layout.
    """

    state: jax.Array         # u8[F, TH, TW] FogState codes
    enabled: jax.Array       # bool[] global fog toggle


@flax.struct.dataclass
class ProjectileArena:
    """Fixed-capacity projectile pool (ref: src/phys/projectile.c:130-178)."""

    active: jax.Array        # bool[P]
    pos: jax.Array           # f32[P,3]
    vel: jax.Array           # f32[P,3]
    faction: jax.Array       # i32[P]
    parent: jax.Array        # i32[P] shooter arena slot
    cookie: jax.Array        # f32[P] damage payload (ref: src/phys/public/phys.h:52-57)


@flax.struct.dataclass
class AnimArena:
    """Device-side skeletal animation state (cfg.skin_joints > 0).

    The reference keeps per-entity clip clocks on the main thread and a
    shared anim texture of joint palettes on the GPU (ref: src/anim/
    anim.c A_Update, src/anim/anim_texture.c:93-145); here both live in
    the state pytree and are advanced by the tick's skinning stage
    (ops/skin.py) at render cadence."""

    clip: jax.Array          # i32[N] current clip id (ops/skin.CLIP_*)
    start: jax.Array         # i32[N] 60 Hz tick the clip started
    palettes: jax.Array      # f32[N, J, 4, 4] skinning palettes — the
                             # anim-texture contents, read by the renderer


@flax.struct.dataclass
class FactionTable:
    active: jax.Array        # bool[F]
    controllable: jax.Array  # bool[F]
    diplomacy: jax.Array     # i32[F,F] DiplomacyState matrix
    chase_slot: jax.Array    # i32[F, L] global-flow slot of the faction's
                             # enemy-seek field PER NAV LAYER (combat chase
                             # routes through it instead of straight-lining
                             # into walls; big/water chasers get fields on
                             # their own layer's dilated costs,
                             # ref: field.c:1209-1678 enemy-seek builders)


@flax.struct.dataclass
class GameState:
    """The complete device-resident simulation state."""

    tick: jax.Array          # i32[] 60Hz frame counter
    ents: EntityArena
    flocks: FlockTable
    fields: FieldSlab
    nav: NavState
    fog: FogState
    projectiles: ProjectileArena
    factions: FactionTable
    rng: jax.Array           # PRNG key
    anim: AnimArena | None = None  # present iff cfg.skin_joints > 0


@flax.struct.dataclass
class TickDeltas:
    """Compact per-tick outputs for the host (events out; orders come in by
    patching state) — the analogue of the reference's movestate patches and
    event notifications (ref: src/game/movement.c:245-262)."""

    arrived: jax.Array       # bool[N] became ARRIVED this tick
    motion_start: jax.Array  # bool[N] started moving this tick (device-side
                             # transitions, e.g. combat chase; host orders
                             # emit MOTION_START directly)
    died: jax.Array          # bool[N] hp crossed 0 this tick
    attack_started: jax.Array  # bool[N] entered ATTACK_ANIM this tick
    proj_hit: jax.Array      # i32[P] entity slot hit this tick, or -1
    proj_hit_shooter: jax.Array  # i32[P] shooter slot for the hit, or -1
    proj_hit_cookie: jax.Array   # f32[P] damage cookie for the hit
                                 # (ref: src/phys/public/phys.h:52-57)
    corpse_expired: jax.Array  # bool[N] corpse removed this tick (slot free)


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------


def _z(shape, dtype):
    return jnp.zeros(shape, dtype=dtype)


def init_arena(cfg: EngineConfig) -> EntityArena:
    n = cfg.max_ents
    return EntityArena(
        alive=_z(n, jnp.bool_),
        uid=_z(n, jnp.int32),
        flags=_z(n, jnp.uint32),
        faction=_z(n, jnp.int32),
        layer=_z(n, jnp.int32),
        pos=_z((n, 2), jnp.float32),
        height=_z(n, jnp.float32),
        prev_pos=_z((n, 2), jnp.float32),
        facing=_z(n, jnp.float32),
        radius=jnp.ones(n, jnp.float32),
        sel_radius=jnp.ones(n, jnp.float32),
        movestate=_z(n, jnp.int32),
        vel=_z((n, 2), jnp.float32),
        max_speed=jnp.full((n,), 10.0, jnp.float32),
        dest=_z((n, 2), jnp.float32),
        flock=jnp.full((n,), -1, jnp.int32),
        vel_hist=_z((n, VEL_HIST_LEN, 2), jnp.float32),
        vel_hist_idx=_z(n, jnp.int32),
        wait_ticks=_z(n, jnp.int32),
        stuck_ticks=_z(n, jnp.int32),
        formation_cell=_z((n, 2), jnp.float32),
        has_formation_cell=_z(n, jnp.bool_),
        hp=jnp.full((n,), 100.0, jnp.float32),
        max_hp=jnp.full((n,), 100.0, jnp.float32),
        combatstate=_z(n, jnp.int32),
        stance=_z(n, jnp.int32),
        target=jnp.full((n,), -1, jnp.int32),
        attack_range=jnp.full((n,), 10.0, jnp.float32),
        base_dmg=jnp.full((n,), 10.0, jnp.float32),
        armour_pc=_z(n, jnp.float32),
        attack_cooldown=_z(n, jnp.int32),
        attack_period=jnp.full((n,), 10, jnp.int32),
        is_ranged=_z(n, jnp.bool_),
        corpse_ticks=_z(n, jnp.int32),
        vision_range=jnp.full((n,), 60.0, jnp.float32),
    )


def init_flocks(cfg: EngineConfig) -> FlockTable:
    f, nc = cfg.max_flocks, cfg.num_chunks
    return FlockTable(
        active=_z(f, jnp.bool_),
        dest=_z((f, 2), jnp.float32),
        layer=_z(f, jnp.int32),
        target_ent=jnp.full((f,), -1, jnp.int32),
        field_slot=jnp.full((f, nc), -1, jnp.int32),
        los_slot=jnp.full((f, nc), -1, jnp.int32),
        global_slot=jnp.full((f,), -1, jnp.int32),
        formation=_z(f, jnp.int32),
    )


def init_fields(cfg: EngineConfig) -> FieldSlab:
    return FieldSlab(
        flow=_z((cfg.field_slab_slots, FIELD_RES, FIELD_RES), jnp.uint8),
        los=_z((cfg.los_slab_slots, FIELD_RES, FIELD_RES), jnp.uint8),
        global_flow=_z((cfg.global_field_slots, cfg.field_h, cfg.field_w),
                       jnp.uint8),
    )


def init_nav(cfg: EngineConfig, passable_cost: int = 1) -> NavState:
    l, h, w = cfg.num_layers, cfg.field_h, cfg.field_w
    return NavState(
        cost_base=jnp.full((l, h, w), passable_cost, jnp.uint8),
        blockers=_z((l, h, w), jnp.int32),
        islands=_z((l, h, w), jnp.int32),
    )


def init_fog(cfg: EngineConfig) -> FogState:
    return FogState(
        state=_z((cfg.max_factions, cfg.tiles_h, cfg.tiles_w), jnp.uint8),
        enabled=jnp.array(True),
    )


def init_projectiles(cfg: EngineConfig) -> ProjectileArena:
    p = cfg.max_projectiles
    return ProjectileArena(
        active=_z(p, jnp.bool_),
        pos=_z((p, 3), jnp.float32),
        vel=_z((p, 3), jnp.float32),
        faction=_z(p, jnp.int32),
        parent=jnp.full((p,), -1, jnp.int32),
        cookie=_z(p, jnp.float32),
    )


def init_factions(cfg: EngineConfig) -> FactionTable:
    f = cfg.max_factions
    return FactionTable(
        active=_z(f, jnp.bool_),
        controllable=_z(f, jnp.bool_),
        diplomacy=_z((f, f), jnp.int32),
        chase_slot=jnp.full((f, cfg.num_layers), -1, jnp.int32),
    )


def init_anim(cfg: EngineConfig) -> AnimArena | None:
    if cfg.skin_joints <= 0:
        return None
    n, j = cfg.max_ents, cfg.skin_joints
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n, j, 4, 4))
    return AnimArena(
        clip=_z(n, jnp.int32),
        start=_z(n, jnp.int32),
        palettes=eye,
    )


def init_state(cfg: EngineConfig, seed: int = 0) -> GameState:
    return GameState(
        tick=jnp.array(0, jnp.int32),
        ents=init_arena(cfg),
        flocks=init_flocks(cfg),
        fields=init_fields(cfg),
        nav=init_nav(cfg),
        fog=init_fog(cfg),
        projectiles=init_projectiles(cfg),
        factions=init_factions(cfg),
        rng=jax.random.PRNGKey(seed),
        anim=init_anim(cfg),
    )


def empty_deltas(cfg: EngineConfig) -> TickDeltas:
    return TickDeltas(
        arrived=_z(cfg.max_ents, jnp.bool_),
        motion_start=_z(cfg.max_ents, jnp.bool_),
        died=_z(cfg.max_ents, jnp.bool_),
        attack_started=_z(cfg.max_ents, jnp.bool_),
        proj_hit=jnp.full((cfg.max_projectiles,), -1, jnp.int32),
        proj_hit_shooter=jnp.full((cfg.max_projectiles,), -1, jnp.int32),
        proj_hit_cookie=_z(cfg.max_projectiles, jnp.float32),
        corpse_expired=_z(cfg.max_ents, jnp.bool_),
    )


def state_byte_size(state: GameState) -> int:
    """Total HBM footprint of the state pytree."""
    return sum(
        np.prod(x.shape) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(state)
    )


def state_mem_accounting(state: GameState) -> dict[str, int]:
    """Per-subsystem HBM byte accounting — the analogue of the reference's
    tagged allocation accounting (ref: src/mem.h:53-95 PF_MALLOC_TAGGED,
    mem_accounting): one entry per top-level state component."""
    out = {}
    for name in ("ents", "flocks", "fields", "nav", "fog", "projectiles",
                 "factions", "anim"):
        out[name] = int(sum(
            np.prod(x.shape) * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(getattr(state, name))))
    out["total"] = state_byte_size(state)
    return out
