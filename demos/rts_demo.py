"""Mini RTS scenario driven entirely through the `pf` scripting API —
the analogue of the reference's scripts/rts/main.py demo: two factions,
a worker economy, a fight, a save/load, and a minimap dump.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from permafrost_engine_tpu.core.config import EngineConfig
    import permafrost_engine_tpu.script.pf as pf

    pf.init(EngineConfig(max_ents=256, chunks_r=2, chunks_c=2,
                         num_layers=12, max_flocks=16, max_projectiles=64,
                         field_slab_slots=32, los_slab_slots=32))
    ctx = pf.context()
    ctx.engine.economy_period = 3

    humans = pf.add_faction("Humans", (0, 0, 255))
    orcs = pf.add_faction("Orcs", (255, 0, 0), controllable=False)
    pf.set_diplomacy_state(humans, orcs, pf.DIPLOMACY_STATE_WAR)

    # --- economy ------------------------------------------------------------
    tree = pf.ResourceEntity("tree.pfobj", "tree", pos=(150, 0, 100),
                             resource_name="Wood", resource_amount=50,
                             faction_id=humans)
    hut = pf.StorageSiteEntity("hut.pfobj", "hut", pos=(100, 0, 140),
                               faction_id=humans)
    hut.set_capacity("Wood", 200)
    worker = pf.HarvesterEntity("w.pfobj", "peon", pos=(100, 0, 100),
                                speed=100.0, faction_id=humans)
    worker.set_gather_speed("Wood", 4)
    worker.set_max_carry("Wood", 8)
    worker.gather(tree)

    # --- armies --------------------------------------------------------------
    class Knight(pf.MovableEntity, pf.CombatableEntity):
        """Unit classes compose mixins, like the reference's script classes."""

    knights = [Knight("k.pfobj", f"knight{i}",
                      pos=(80 + 6 * i, 0, 200), speed=60.0,
                      faction_id=humans, base_dmg=20.0, hp=150.0)
               for i in range(6)]
    grunts = [pf.CombatableEntity("g.pfobj", f"grunt{i}",
                                  pos=(300 + 6 * i, 0, 300),
                                  faction_id=orcs, hp=80.0, base_dmg=5.0)
              for i in range(6)]

    deaths = []
    pf.register_event_handler(pf.EVENT_ENTITY_DEATH, deaths.append)

    # --- garrison mission: scouts ride a transport to the front -------------
    tower = pf.GarrisonableEntity("t.pfobj", "tower", pos=(260, 0, 200),
                                  faction_id=humans, garrison_capacity=4)
    scouts = [pf.GarrisonEntity("s.pfobj", f"scout{i}",
                                pos=(60 + 6 * i, 0, 240), speed=80.0,
                                faction_id=humans)
              for i in range(2)]
    # garrison() is move-then-enter: returns False with a move order while
    # far, True once adjacent — the script drives the mission like the
    # reference's rts scripts do
    pending = list(scouts)
    for s in pending:
        s.garrison(tower)

    pf.move_in_formation(knights, (300, 0, 280), pf.FORMATION_RANK)
    pf.step(120)

    # --- save MID-MARCH (formation flock live), reload, keep fighting -------
    assert pf.save_session("/tmp/rts_demo_mid.bin")
    assert pf.load_session("/tmp/rts_demo_mid.bin")
    # load_session rebuilds the script layer from the blob alone (fresh-
    # process semantics, ref: session.c:176-233): the pre-save handler now
    # lives on inside the restored layer, bound to the restored list. This
    # harness runs OUTSIDE the saved layer, so re-register its local
    # accumulator to keep observing deaths from here.
    pf.register_event_handler(pf.EVENT_ENTITY_DEATH, deaths.append)

    for second in range(30):
        pf.step(60)
        pending = [s for s in pending if not s.garrison(tower)]
        wood = pf.get_resource_stored(humans, "Wood")
        orc_alive = sum(0 if g.zombie else (1 if g.hp > 0 else 0)
                        for g in grunts)
        if second % 5 == 4:
            print(f"t={second + 1:2d}s wood={wood:3d} orcs_alive={orc_alive} "
                  f"deaths={len(deaths)}")
        if orc_alive == 0 and wood >= 16:
            break

    assert pf.get_resource_stored(humans, "Wood") >= 16, "economy failed"
    assert any(d["uid"] in [g.uid for g in grunts] for d in deaths), \
        "no orcs died"
    garrisoned = tower.garrisoned_units
    assert len(garrisoned) == 2, f"garrison failed: {garrisoned}"

    # --- session + presentation ----------------------------------------------
    assert pf.save_session("/tmp/rts_demo_save.bin")
    assert pf.load_session("/tmp/rts_demo_save.bin")
    assert pf.dump_framebuffer("/tmp/rts_demo_minimap.npy")
    img = np.load("/tmp/rts_demo_minimap.npy")
    print(f"minimap: {img.shape}, {img.max()} max value")
    print(f"nav stats: {pf.get_nav_perfstats()}")
    print("RTS DEMO COMPLETE")


if __name__ == "__main__":
    main()
