"""Combat, projectiles, and fog-of-war end-to-end (BASELINE config #4)."""

import numpy as np
import pytest

from permafrost_engine_tpu.core.config import (
    CombatStance,
    DiplomacyState,
    EngineConfig,
    FogState,
    UNITS_PER_TILE,
)
from permafrost_engine_tpu.game.engine import Engine


def small_cfg():
    return EngineConfig(
        max_ents=32,
        chunks_r=1,
        chunks_c=1,
        num_layers=1,
        max_flocks=4,
        max_projectiles=16,
        field_slab_slots=8,
        los_slab_slots=8,
    )


def two_faction_engine():
    eng = Engine(small_cfg())
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    return eng


def test_melee_kill_and_corpse_removal():
    eng = two_faction_engine()
    # strong unit vs harmless unit, adjacent
    a = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                        base_dmg=20.0, hp=100.0, attack_period=1)
    b = eng.spawn_batch(np.array([[104.0, 100.0]], np.float32), faction=1,
                        base_dmg=0.0, hp=40.0)
    eng.step(240)  # 4 seconds
    kinds = [e[0] for e in eng.events]
    assert "attack_start" in kinds
    assert ("entity_death", {"uid": b[0]}) in eng.events
    # attacker survives
    assert ("entity_death", {"uid": a[0]}) not in eng.events
    # corpse expires (~3s at 1 Hz) and the slot is reclaimed
    assert ("entity_removed", {"uid": b[0]}) in eng.events
    assert b[0] not in eng.uid_to_slot


def test_aggressive_chase():
    eng = two_faction_engine()
    a = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                        max_speed=40.0, vision_range=100.0, attack_range=5.0)
    eng.spawn_batch(np.array([[160.0, 100.0]], np.float32), faction=1,
                    base_dmg=0.0, stance=int(CombatStance.NO_ENGAGEMENT))
    p0 = eng.pos_of(a[0]).copy()
    eng.step(60)
    p1 = eng.pos_of(a[0])
    assert p1[0] > p0[0] + 10, "aggressive unit did not chase visible enemy"


def test_no_engagement_never_attacks():
    eng = two_faction_engine()
    eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                    stance=int(CombatStance.NO_ENGAGEMENT))
    b = eng.spawn_batch(np.array([[104.0, 100.0]], np.float32), faction=1,
                        stance=int(CombatStance.NO_ENGAGEMENT))
    eng.step(120)
    hp = np.asarray(eng.state.ents.hp)[eng.uid_to_slot[b[0]]]
    assert hp == 100.0
    assert not any(e[0] == "attack_start" for e in eng.events)


def test_ranged_projectile_hit():
    eng = two_faction_engine()
    eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                    is_ranged=True, attack_range=60.0, base_dmg=25.0,
                    attack_period=100, stance=int(CombatStance.HOLD_POSITION))
    b = eng.spawn_batch(np.array([[140.0, 100.0]], np.float32), faction=1,
                        base_dmg=0.0, stance=int(CombatStance.NO_ENGAGEMENT))
    eng.step(120)
    hp = np.asarray(eng.state.ents.hp)[eng.uid_to_slot[b[0]]]
    assert hp < 100.0, "projectile never landed"
    assert hp >= 100.0 - 2 * 25.0  # at most a couple of volleys


def test_projectile_kill_produces_corpse_and_events():
    """A lethal volley must kill, not zombify: projectile damage lands
    between combat substeps, so death detection must key off combatstate
    rather than the pre-substep hp (round-1 advisor finding)."""
    eng = two_faction_engine()
    a = eng.spawn_batch(np.array([[100.0, 100.0]], np.float32), faction=0,
                        is_ranged=True, attack_range=60.0, base_dmg=80.0,
                        attack_period=1, stance=int(CombatStance.HOLD_POSITION))
    b = eng.spawn_batch(np.array([[140.0, 100.0]], np.float32), faction=1,
                        base_dmg=0.0, hp=100.0,
                        stance=int(CombatStance.NO_ENGAGEMENT))
    eng.step(360)
    # the hit surfaced as a script-visible event with shooter + cookie
    hits = [p for k, p in eng.events if k == "projectile_hit"]
    assert hits and hits[0]["uid"] == b[0]
    assert hits[0]["shooter"] == a[0]
    assert hits[0]["cookie"] == 80.0
    # the target died, became a corpse, and its slot was reclaimed
    assert ("entity_death", {"uid": b[0]}) in eng.events
    assert ("entity_removed", {"uid": b[0]}) in eng.events
    assert b[0] not in eng.uid_to_slot


def test_fog_explored_memory():
    eng = two_faction_engine()
    u = eng.spawn_batch(np.array([[64.0, 64.0]], np.float32), faction=0,
                        vision_range=40.0, max_speed=100.0)
    eng.step(12)  # cover at least one fog update (6 Hz cadence)
    fog = np.asarray(eng.state.fog.state)[0]
    tr, tc = int(64 / UNITS_PER_TILE), int(64 / UNITS_PER_TILE)
    assert fog[tr, tc] == FogState.VISIBLE
    far = fog[eng.cfg.tiles_h - 1, eng.cfg.tiles_w - 1]
    assert far == FogState.UNEXPLORED
    # move away: old position falls into IN_FOG (explored memory)
    eng.move(u, (200.0, 200.0))
    eng.step(300)
    fog = np.asarray(eng.state.fog.state)[0]
    assert fog[tr, tc] == FogState.IN_FOG
    # enemy faction still hasn't explored anything
    fog1 = np.asarray(eng.state.fog.state)[1]
    assert (fog1 == FogState.UNEXPLORED).all()


def test_seek_enemies_hunts_across_map():
    """SEEK_ENEMIES: units follow a whole-map enemy-seek field to distant
    enemies with no explicit destination (ref: TARGET_ENEMIES fields)."""
    eng = two_faction_engine()
    hunters = eng.spawn_batch(np.array([[40.0, 40.0]], np.float32),
                              faction=0, max_speed=80.0, base_dmg=30.0,
                              vision_range=40.0)
    prey = eng.spawn_batch(np.array([[200.0, 200.0]], np.float32),
                           faction=1, base_dmg=0.0, hp=30.0,
                           stance=int(CombatStance.NO_ENGAGEMENT))
    assert eng.seek_enemies(hunters)
    eng.step(600)
    assert ("entity_death", {"uid": prey[0]}) in eng.events, \
        "hunter never found its prey"


def test_fog_height_aware():
    """A unit in a valley cannot see up onto a plateau; a unit on the
    plateau sees down (ref: height-aware shadowcasting path,
    fog_of_war.c:427-541)."""
    from permafrost_engine_tpu.assets.pfmap import make_flat_map
    from permafrost_engine_tpu.core.config import UNITS_PER_TILE
    from tests.test_engine_move import small_cfg as move_cfg

    cfg = move_cfg()  # 2x2 chunks: 64x64 tiles
    m = make_flat_map(cfg.chunks_r, cfg.chunks_c)
    m.base_height[:, 32:] = 8   # eastern plateau
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.load_map_data(m)
    # faction 0 unit in the valley near the cliff; faction 1 on the plateau
    eng.spawn_batch(np.array([[28 * UNITS_PER_TILE, 100.0]], np.float32),
                    faction=0, vision_range=80.0)
    eng.spawn_batch(np.array([[36 * UNITS_PER_TILE, 100.0]], np.float32),
                    faction=1, vision_range=80.0)
    eng.step(12)
    fog0 = np.asarray(eng.state.fog.state)[0]
    fog1 = np.asarray(eng.state.fog.state)[1]
    tr = int(100.0 / UNITS_PER_TILE)
    assert fog0[tr, 26] == FogState.VISIBLE          # own valley tile
    assert fog0[tr, 38] != FogState.VISIBLE          # up on the plateau: no
    assert fog1[tr, 38] == FogState.VISIBLE          # plateau unit sees home
    assert fog1[tr, 26] == FogState.VISIBLE          # and down the cliff


def test_seek_field_invalidation_is_change_driven(monkeypatch):
    """Per-faction blocker-count analogue: enemy-seek fields rebuild only
    when an enemy faction's chunk signature changes (moved a tile, died,
    spawned) — not on a blind timer (ref: nav_data.h:118-158 per-faction
    blocker counts; fieldcache.h enemy-seek invalidation)."""
    eng = two_faction_engine()
    hunters = eng.spawn_batch(np.array([[40.0, 40.0]], np.float32),
                              faction=0, max_speed=0.0)
    prey = eng.spawn_batch(np.array([[200.0, 200.0]], np.float32),
                           faction=1, max_speed=0.0)
    assert eng.seek_enemies(hunters)

    builds = []
    orig = eng.nav.build_enemy_seek_fields_batch

    def counting(state, specs):
        builds.extend(fid for (_f, _l, _s, fid) in specs)
        return orig(state, specs)

    monkeypatch.setattr(eng.nav, "build_enemy_seek_fields_batch", counting)

    # signature snapshots are PIPELINED like the delta drains (async copy
    # consumed one refresh period later), so rebuilds land one period
    # after the change. Prime: first snapshot + first consume.
    eng.step(eng.seek_refresh_period * 2)
    static_builds = len(builds)
    # further cadences with a static world: NO rebuilds
    eng.step(eng.seek_refresh_period * 3)
    assert len(builds) == static_builds

    # teleport the prey a chunk-tile away: signature changes -> rebuild
    # (one period late: the changed snapshot is consumed next cadence)
    slot = eng.uid_to_slot[int(prey[0])]
    e = eng.state.ents
    import jax.numpy as jnp
    eng.state = eng.state.replace(ents=e.replace(
        pos=e.pos.at[slot].set(jnp.asarray([120.0, 120.0]))))
    eng.step(eng.seek_refresh_period * 2)
    assert len(builds) > static_builds

    moved_builds = len(builds)
    eng.step(eng.seek_refresh_period * 3)   # static again
    assert len(builds) == moved_builds

    # killing the enemy changes the signature too (again one period late)
    eng.state = eng.state.replace(ents=eng.state.ents.replace(
        hp=eng.state.ents.hp.at[slot].set(0.0),
        alive=eng.state.ents.alive.at[slot].set(False)))
    eng.step(eng.seek_refresh_period * 2)
    assert len(builds) > moved_builds
