"""Battle soak at test scale: long-horizon invariants of the full combat
pipeline (tools/probe_soak.py runs the 10k version on real hardware).

Invariants (ref semantics):
- positions stay finite through sustained melee + projectiles
- hp<=0 entities become corpses within one combat period (projectile
  kills at 30 Hz transition at the next 10 Hz combat substep —
  ref: src/game/combat.c:2244 corpse handling cadence)
- slot accounting stays exact as corpses expire and slots recycle
"""

import numpy as np

from permafrost_engine_tpu.core.config import (CombatState, DiplomacyState,
                                               EngineConfig)
from permafrost_engine_tpu.game.engine import Engine


def test_battle_soak_invariants():
    cfg = EngineConfig(max_ents=160)
    eng = Engine(cfg)
    eng.add_faction(0)
    eng.add_faction(1)
    eng.set_diplomacy(0, 1, DiplomacyState.WAR)
    rng = np.random.default_rng(7)

    def army(x0):
        x = x0 + rng.random(64) * 30
        z = 400 + np.arange(64) % 8 * 4.0 + rng.random(64)
        return np.stack([x, z], 1).astype(np.float32)

    ranged = rng.random(64) < 0.25
    a = eng.spawn_batch(army(380.0), faction=0, max_speed=20.0, hp=120.0,
                        is_ranged=ranged,
                        attack_range=np.where(ranged, 40.0, 5.0))
    b = eng.spawn_batch(army(520.0), faction=1, max_speed=20.0, hp=120.0,
                        is_ranged=ranged,
                        attack_range=np.where(ranged, 40.0, 5.0))
    eng.move(a, (540.0, 415.0))
    eng.move(b, (390.0, 415.0))

    n0 = 128
    for _ in range(6):
        eng.step_scan(180)
        ents = eng.state.ents
        alive = np.asarray(ents.alive)
        pos = np.asarray(ents.pos)
        hp = np.asarray(ents.hp)
        cs = np.asarray(ents.combatstate)
        assert np.isfinite(pos[alive]).all()
        # dead-but-not-corpse is legal only transiently
        trans = alive & (hp <= 0.0) & (cs != CombatState.CORPSE)
        if trans.any():
            eng.step(6)
            e2 = eng.state.ents
            stuck = (trans & np.asarray(e2.alive)
                     & (np.asarray(e2.hp) <= 0.0)
                     & (np.asarray(e2.combatstate) != CombatState.CORPSE))
            assert not stuck.any(), "projectile kills left zombies"
        n_live = int(np.asarray(eng.state.ents.alive).sum())
        assert n_live + len(eng._free_slots) == cfg.max_ents
        assert len(eng.uid_to_slot) == n_live

    assert int(np.asarray(eng.state.ents.alive).sum()) < n0, \
        "no deaths in 18 sim seconds of battle"
