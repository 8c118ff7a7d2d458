"""Combat FSM + target acquisition + melee damage as masked dense updates.

Mirrors the reference's combat system structure (ref: src/game/combat.c:
142-175 state machine, 2218-2242 tick, 778 melee damage formula):

  NOT_IN_COMBAT -> (enemy in vision, AGGRESSIVE) -> MOVING_TO_TARGET
  MOVING_TO_TARGET -> (in attack range) -> CAN_ATTACK
  CAN_ATTACK -> cooldown elapses -> ATTACK_ANIM -> damage applied
  hp <= 0 -> DEATH_ANIM -> CORPSE (1 Hz countdown, combat.c:2244-2263)

Damage: melee `dmg = attacker.base_dmg * (1 - target.armour_pc)`
(combat.c:778); ranged attacks spawn projectiles carrying damage in the
cookie, applied on hit (combat.c:1020).

The per-entity fiber fan-out becomes whole-arena masked updates; damage
aggregation is a scatter-add keyed by target slot, which makes simultaneous
attacks commutative (the reference serializes them on the main thread).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from permafrost_engine_tpu.core.config import (
    CombatStance,
    CombatState,
    DiplomacyState,
    EngineConfig,
    EntityFlags,
    MoveState,
)
from permafrost_engine_tpu.ops import grid as grid_ops


def combat_substep(cfg: EngineConfig, state, deltas):
    ents = state.ents
    n = cfg.max_ents

    combatable = (ents.flags & jnp.uint32(EntityFlags.COMBATABLE)) != 0
    dead = ents.hp <= 0.0
    fighter = ents.alive & combatable & ~dead
    targetable = ents.alive & combatable & ~dead

    war = state.factions.diplomacy == DiplomacyState.WAR

    # ---- validate current target ------------------------------------------
    t = ents.target
    t_ok = (t >= 0) & targetable[jnp.clip(t, 0, n - 1)]
    t = jnp.where(t_ok, t, -1)

    # ---- acquire: nearest enemy in vision (combat.c target acquisition) ----
    near_i, near_d = grid_ops.nearest_match(
        ents.pos, fighter, ents.pos, targetable,
        (ents.faction, war, ents.faction),
        block=min(1024, n),
    )
    in_vision = near_d <= ents.vision_range
    may_engage = fighter & (ents.stance != CombatStance.NO_ENGAGEMENT)
    acquire = may_engage & (t < 0) & (near_i >= 0) & in_vision
    t = jnp.where(acquire, near_i, t)

    # ---- range test ----------------------------------------------------------
    ti = jnp.clip(t, 0, n - 1)
    tpos = ents.pos[ti]
    tdist = jnp.linalg.norm(tpos - ents.pos, axis=-1)
    reach = ents.attack_range + ents.sel_radius[ti]
    in_range = (t >= 0) & (tdist <= reach)

    # HOLD_POSITION units never chase; neither can immobile entities
    # like towers (public/game.h stances)
    movable = (ents.flags & jnp.uint32(EntityFlags.MOVABLE)) != 0
    chase = (t >= 0) & ~in_range & (
        ents.stance == CombatStance.AGGRESSIVE) & movable

    # ---- FSM -----------------------------------------------------------------
    cs = ents.combatstate
    new_cs = cs
    new_cs = jnp.where(fighter & (t < 0), CombatState.NOT_IN_COMBAT, new_cs)
    new_cs = jnp.where(fighter & chase, CombatState.MOVING_TO_TARGET, new_cs)
    new_cs = jnp.where(fighter & in_range, CombatState.CAN_ATTACK, new_cs)
    # HOLD_POSITION with out-of-range target: drop it
    drop = fighter & (t >= 0) & ~in_range & (ents.stance == CombatStance.HOLD_POSITION)
    t = jnp.where(drop, -1, t)
    new_cs = jnp.where(drop, CombatState.NOT_IN_COMBAT, new_cs)

    # ---- attacks ---------------------------------------------------------------
    cooldown = jnp.maximum(ents.attack_cooldown - 1, 0)
    can_attack = fighter & in_range & (new_cs == CombatState.CAN_ATTACK)
    attack_now = can_attack & (cooldown == 0)
    cooldown = jnp.where(attack_now, ents.attack_period, cooldown)

    melee_now = attack_now & ~ents.is_ranged
    dmg_out = jnp.where(melee_now, ents.base_dmg * (1.0 - ents.armour_pc[ti]), 0.0)
    dmg_in = jnp.zeros(n, jnp.float32).at[
        jnp.where(melee_now, ti, n)].add(dmg_out, mode="drop")
    new_hp = jnp.where(ents.alive, ents.hp - dmg_in, ents.hp)

    # ---- deaths (DEATH_ANIM folded into CORPSE entry; anim events are host) --
    # keyed off combatstate, not the pre-substep hp: a projectile kill sets
    # hp <= 0 *between* combat substeps (projectile_substep runs at 30 Hz),
    # and gating on ~dead would leave such entities alive-with-negative-hp
    # forever — no CORPSE transition, no death event, slot never reclaimed
    died_now = ents.alive & (cs != CombatState.CORPSE) & (new_hp <= 0.0)
    new_cs = jnp.where(died_now, CombatState.CORPSE, new_cs)
    corpse_ticks = jnp.where(died_now, 3, ents.corpse_ticks)  # ~3s at 1 Hz
    t = jnp.where(died_now, -1, t)

    # dead entities stop; chasers steer at their target (direct seek,
    # flock -1 -> arrive steering in the movement substep)
    new_movestate = ents.movestate
    new_movestate = jnp.where(died_now, MoveState.ARRIVED, new_movestate)
    new_movestate = jnp.where(
        chase & fighter & (ents.movestate == MoveState.ARRIVED),
        MoveState.MOVING, new_movestate)
    stop_to_fight = fighter & in_range & (cs == CombatState.MOVING_TO_TARGET)
    new_movestate = jnp.where(stop_to_fight, MoveState.ARRIVED, new_movestate)
    new_dest = jnp.where((chase & fighter)[:, None], tpos, ents.dest)
    new_flock = jnp.where(chase & fighter, -1, ents.flock)
    new_vel = jnp.where((died_now | stop_to_fight)[:, None], 0.0, ents.vel)

    new_ents = ents.replace(
        target=t,
        combatstate=new_cs,
        attack_cooldown=cooldown,
        hp=new_hp,
        corpse_ticks=corpse_ticks,
        movestate=new_movestate,
        dest=new_dest,
        flock=new_flock,
        vel=new_vel,
    )
    deltas = deltas.replace(
        died=deltas.died | died_now,
        attack_started=deltas.attack_started | attack_now,
        motion_start=deltas.motion_start | (
            chase & fighter & (ents.movestate == MoveState.ARRIVED)),
    )
    return state.replace(ents=new_ents), deltas, attack_now


def corpse_substep(cfg: EngineConfig, state, deltas):
    """1 Hz corpse countdown and removal (ref: combat.c:2244-2263)."""
    ents = state.ents
    corpse = ents.alive & (ents.combatstate == CombatState.CORPSE)
    ticks = jnp.where(corpse, jnp.maximum(ents.corpse_ticks - 1, 0),
                      ents.corpse_ticks)
    expired = corpse & (ticks == 0)
    new_ents = ents.replace(
        corpse_ticks=ticks,
        alive=ents.alive & ~expired,
    )
    return state.replace(ents=new_ents), deltas, expired
