"""Soak probe: run the 10k battle ~200 sim seconds on the real chip and
assert state invariants at scale (NaN-free positions, projectile-kill
transients resolve within one combat period, exact slot accounting)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import bench

eng = bench.build_battle()
eng.step(60)
for w in range(40):           # up to 12000 frames = 200 sim seconds
    eng.step_scan(300)
    ents = eng.state.ents
    alive = np.asarray(ents.alive)
    pos = np.asarray(ents.pos)
    hp = np.asarray(ents.hp)
    fac = np.asarray(ents.faction)
    assert np.isfinite(pos[alive]).all(), "NaN/inf positions"
    a0 = int((alive & (fac == 0)).sum()); a1 = int((alive & (fac == 1)).sum())
    cs = np.asarray(ents.combatstate)
    # hp<=0 & not-corpse is legal TRANSIENTLY (projectile kills at 30 Hz
    # become corpses at the next 10 Hz combat substep, like the
    # reference); it must RESOLVE within one combat period
    trans = alive & (hp <= 0) & (cs != 5)
    if trans.any():
        eng.step(6)
        ents = eng.state.ents
        cs2 = np.asarray(ents.combatstate)
        alive2 = np.asarray(ents.alive)
        stuck = trans & alive2 & (np.asarray(ents.hp) <= 0) & (cs2 != 5)
        assert not stuck.any(), f"{stuck.sum()} zombies persisted"
    print(f"w{w}: f0={a0} f1={a1} transient_dead={int(trans.sum())}",
          flush=True)
    if a0 == 0 or a1 == 0:
        print("one side eliminated")
        break
# slot accounting: free slots + live slots == capacity
n_live = int(np.asarray(eng.state.ents.alive).sum())
print("final: live", n_live, "free", len(eng._free_slots),
      "uids", len(eng.uid_to_slot))
assert n_live + len(eng._free_slots) == eng.cfg.max_ents
assert len(eng.uid_to_slot) == n_live
print("SOAK OK")
