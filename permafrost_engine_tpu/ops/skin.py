"""Whole-arena device skinning: per-frame pose palettes for every entity.

The reference advances each animated entity's clip clock on the main
thread and bakes the visible entities' joint palettes into one shared
GL texture each rendered frame (ref: src/anim/anim.c A_Update,
src/anim/anim_texture.c:93-145 A_Texture_Update). Here the whole thing is
ONE batched device stage inside the jitted tick:

  * clip selection is derived from the simulation FSMs (corpse -> die,
    attacking -> attack, moving -> run, else idle), replacing the
    reference's per-entity script calls to pf.play_anim for the
    combat/movement-driven clips (combat.c ATTACK_ANIM handling);
  * clip clocks live in the state pytree (clip id + start tick), so clip
    restarts on FSM transitions are exact and replay-deterministic;
  * keyframe interpolation + the hierarchy products + inverse-bind
    multiply run for ALL alive entities as batched [N, J, 4, 4] math
    (ops/pose.py), producing `state.anim.palettes` — the anim-texture
    contents — every render-cadence frame with zero host round trips.

Keyframe fetches are ROW gathers of packed [J, 10] (trans|quat|scale)
rows — one contiguous unit per (entity, keyframe), never per-element
gathers (TPU element gathers run ~1 elem/cycle).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.config import CombatState, FRAME_HZ, MoveState
from permafrost_engine_tpu.ops import pose as pose_ops

ANIM_FPS = 24.0  # reference clip playback rate (render/anim_system.py)

# canonical clip slots (bank rows); games may register more
CLIP_IDLE, CLIP_RUN, CLIP_ATTACK, CLIP_DIE = 0, 1, 2, 3


@flax.struct.dataclass
class SkinBank:
    """Stacked clip keyframes for one rig, device-resident.

    `pack` holds every clip's keyframes as [C * F, J, 10] rows of
    (trans[3] | quat[4] | scale[3]); clips shorter than F pad with their
    last keyframe (never sampled: `frames` bounds the phase).
    """

    pack: jax.Array        # f32[C*F, J, 10]
    frames: jax.Array      # i32[C] real keyframe count per clip
    loop: jax.Array        # bool[C] LOOP (wrap) vs ONCE (hold last frame)
    inv_bind: jax.Array    # f32[J, 4, 4]
    max_frames: int = flax.struct.field(pytree_node=False)
    levels: tuple = flax.struct.field(pytree_node=False)
    # STATIC hierarchy (compile-time structure: pose_palette indexes
    # parents with numpy, so the tick's traced SkinBank must carry them
    # as concrete values, not device arrays)
    parents: tuple = flax.struct.field(pytree_node=False, default=())


def make_bank(clips: list[tuple[np.ndarray, np.ndarray, np.ndarray, bool]],
              parents: np.ndarray,
              bind_trans: np.ndarray, bind_rots: np.ndarray,
              bind_scales: np.ndarray) -> SkinBank:
    """Build a SkinBank from per-clip (trans [F,J,3], rots [F,J,4],
    scales [F,J,3], loop) keyframe stacks plus the bind pose."""
    j = parents.shape[0]
    f_max = max(int(c[0].shape[0]) for c in clips)
    packs, frames, loops = [], [], []
    for trans, rots, scales, loop in clips:
        f = trans.shape[0]
        p = np.concatenate([trans, rots, scales], axis=-1)  # [F, J, 10]
        if f < f_max:
            p = np.concatenate(
                [p, np.repeat(p[-1:], f_max - f, axis=0)], axis=0)
        packs.append(p)
        frames.append(f)
        loops.append(loop)
    pack = np.concatenate(packs, axis=0).astype(np.float32)  # [C*F, J, 10]

    levels = tuple(tuple(lvl.tolist())
                   for lvl in pose_ops.hierarchy_levels(parents))
    bind = pose_ops.trs_to_mat(
        jnp.asarray(bind_trans), jnp.asarray(bind_rots),
        jnp.asarray(bind_scales))
    bind_glob = pose_ops.pose_palette(
        bind[None], jnp.broadcast_to(jnp.eye(4), (1, j, 4, 4)),
        jnp.asarray(parents, jnp.int32), levels)[0]
    inv_bind = jnp.linalg.inv(bind_glob)

    return SkinBank(
        pack=jnp.asarray(pack),
        frames=jnp.asarray(frames, jnp.int32),
        loop=jnp.asarray(loops, jnp.bool_),
        parents=tuple(int(p) for p in np.asarray(parents)),
        inv_bind=inv_bind,
        max_frames=f_max,
        levels=levels,
    )


def bank_from_pfobj(model, clip_names: list[str] | None = None) -> SkinBank:
    """SkinBank from a loaded PFObj's clips (assets/pfobj.py). Clips are
    stacked in `clip_names` order (default: idle/run/attack/die aliases
    falling back to the model's clip list)."""
    names = list(model.clips.keys())
    if clip_names is None:
        def pick(*cands):
            for c in cands:
                if c in model.clips:
                    return c
            return names[0]
        clip_names = [pick("idle"), pick("run", "walk", "move"),
                      pick("attack", "strike"), pick("die", "death")]
    clips = []
    for nm in clip_names:
        c = model.clips[nm]
        clips.append((np.asarray(c.trans), np.asarray(c.rots),
                      np.asarray(c.scales),
                      nm not in ("die", "death", "attack")))
    return make_bank(clips, np.asarray(model.joint_parents),
                     np.asarray(model.bind_trans),
                     np.asarray(model.bind_rots),
                     np.asarray(model.bind_scales))


def make_procedural_bank(num_joints: int = 32) -> SkinBank:
    """Deterministic humanoid-scale test rig: a torso chain with four
    3-joint limb chains and filler joints, and 4 clips (idle/run/attack/
    die) of sinusoid joint swings — the default bank for benches/tests
    when no pfobj model is loaded. Workload-equivalent to a real rig:
    same shapes, same hierarchy depth."""
    j = num_joints
    parents = np.zeros(j, np.int32)
    parents[0] = -1
    # torso chain 0-5, then limbs hang off joints 2 (arms) and 0 (legs)
    for i in range(1, 6):
        parents[i] = i - 1
    anchors = [2, 2, 0, 0]
    idx = 6
    for limb in range(4):
        prev = anchors[limb]
        for seg in range(3):
            if idx >= j:
                break
            parents[idx] = prev
            prev = idx
            idx += 1
    while idx < j:                       # filler: ribbon off the torso
        parents[idx] = (idx - 1) if (idx % 4) else 3
        idx += 1

    bind_trans = np.zeros((j, 3), np.float32)
    bind_trans[:, 1] = 0.3               # stacked 0.3u bone offsets
    bind_rots = np.zeros((j, 4), np.float32)
    bind_rots[:, 3] = 1.0
    bind_scales = np.ones((j, 3), np.float32)

    def clip(f, amp, freq, loop):
        t = np.arange(f, dtype=np.float32)[:, None]     # [F, 1]
        ph = np.arange(j, dtype=np.float32)[None, :]    # [1, J]
        ang = amp * np.sin(2 * np.pi * freq * t / f + ph)  # [F, J]
        half = ang * 0.5
        rots = np.stack([np.sin(half), np.zeros_like(half),
                         np.zeros_like(half), np.cos(half)], -1)
        trans = np.repeat(bind_trans[None], f, 0)
        scales = np.ones((f, j, 3), np.float32)
        return trans.astype(np.float32), rots.astype(np.float32), \
            scales.astype(np.float32), loop

    clips = [clip(16, 0.10, 1.0, True),   # idle: slow sway
             clip(12, 0.45, 2.0, True),   # run: fast swing
             clip(10, 0.60, 1.0, False),  # attack: one swing
             clip(14, 0.80, 0.5, False)]  # die: one fall
    return make_bank(clips, parents, bind_trans, bind_rots, bind_scales)


def select_clips(ents) -> jax.Array:
    """Per-entity clip id from the simulation FSMs (the reference's
    script-driven pf.play_anim calls for combat/movement transitions,
    ref: src/game/combat.c ATTACK_ANIM + scripts/rts units)."""
    moving = (
        (ents.movestate == MoveState.MOVING)
        | (ents.movestate == MoveState.TURNING)
        | (ents.movestate == MoveState.SEEK_ENEMIES)
        | (ents.movestate == MoveState.ARRIVING_TO_CELL)
        | (ents.movestate == MoveState.SURROUND_ENTITY))
    dead = ((ents.combatstate == CombatState.DEATH_ANIM)
            | (ents.combatstate == CombatState.CORPSE))
    attacking = ents.combatstate == CombatState.ATTACK_ANIM
    return jnp.where(
        dead, CLIP_DIE,
        jnp.where(attacking, CLIP_ATTACK,
                  jnp.where(moving, CLIP_RUN, CLIP_IDLE))).astype(jnp.int32)


def skin_palettes(bank: SkinBank, clip: jax.Array,
                  tsec: jax.Array) -> jax.Array:
    """Palettes f32[N, J, 4, 4] for N entities at clip-local times `tsec`
    — keyframe lerp/slerp + hierarchy products + inverse bind, all
    batched (the anim-texture contents, anim_texture.c:93-145)."""
    nf = bank.frames[clip]                                   # [N] i32
    nff = nf.astype(jnp.float32)
    ph = tsec * ANIM_FPS
    # LOOP wraps over [0, nf) (the nf-1 -> 0 segment blends back to the
    # first keyframe); ONCE clamps to the last keyframe and holds
    looped = jnp.mod(ph, jnp.maximum(nff, 1.0))
    once = jnp.minimum(ph, nff - 1.0)
    phase = jnp.where(bank.loop[clip], looped, once)
    i0 = jnp.minimum(jnp.floor(phase).astype(jnp.int32), nf - 1)
    w = (phase - i0.astype(jnp.float32))[:, None, None]      # [N,1,1]
    i1 = jnp.where(bank.loop[clip],
                   jnp.mod(i0 + 1, jnp.maximum(nf, 1)),
                   jnp.minimum(i0 + 1, nf - 1))
    base = clip * bank.max_frames
    r0 = bank.pack[base + i0]                                # [N, J, 10]
    r1 = bank.pack[base + i1]
    tr = r0[..., 0:3] * (1 - w) + r1[..., 0:3] * w
    q = pose_ops.quat_slerp(r0[..., 3:7], r1[..., 3:7], w)
    sc = r0[..., 7:10] * (1 - w) + r1[..., 7:10] * w
    local = pose_ops.trs_to_mat(tr, q, sc)                   # [N, J, 4, 4]
    return pose_ops.pose_palette(local, bank.inv_bind, bank.parents,
                                 bank.levels)


def skin_substep(cfg, bank: SkinBank, state):
    """The tick's render-cadence skinning stage: advance clip FSM clocks
    and rebuild the full palette array (state.anim)."""
    ents = state.ents
    anim = state.anim
    new_clip = select_clips(ents)
    changed = new_clip != anim.clip
    start = jnp.where(changed, state.tick, anim.start)
    tsec = (state.tick - start).astype(jnp.float32) / float(FRAME_HZ)
    # deterministic desync: golden-ratio per-slot phase offset so 10k
    # idle units don't breathe in lockstep (no per-entity RNG state)
    slots = jnp.arange(cfg.max_ents, dtype=jnp.float32)
    tsec = tsec + jnp.mod(slots * 0.61803398875, 1.0)
    pal = skin_palettes(bank, new_clip, tsec)
    return state.replace(anim=anim.replace(
        clip=new_clip, start=start, palettes=pal))
