"""Driver for tests/test_fresh_process.py — runs as a SUBPROCESS.

Phase "a": build a live scenario (moving entity, closure event handler,
mid-execution pf.Task fiber), save the session at frame 30, keep running
to frame 90, dump observables.

Phase "b": in a FRESH interpreter, restore the session from the blob
alone (no script re-run, no in-memory grafting), run the same 60 frames,
dump the same observables. The parent test asserts they match — the
cross-process whole-session restore the reference gets from pickling the
entire interpreter (ref: /root/reference/src/script/py_pickle.c:278-369,
src/session.c:176-233, py_task.c:654 mid-execution fibers).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from permafrost_engine_tpu.core.config import EngineConfig  # noqa: E402
import permafrost_engine_tpu.script.pf as pf  # noqa: E402

EVT_BEAT = 0x10000 + 7      # script event range (>= EventType.SCRIPT_BASE)
SAVE_FRAMES = 30
RUN_FRAMES = 60


def _cfg():
    return EngineConfig(max_ents=64, chunks_r=2, chunks_c=2,
                        num_layers=1, max_flocks=4)


def _observables(ctx):
    import numpy as np
    eng = ctx.engine
    # the restored handler closure is only reachable through the bus in a
    # fresh process — dig its cells out to read the captured counter/entity
    counter = None
    wrapper_uid = None
    for (uid, evt), lst in eng.bus._handlers.items():
        if evt != EVT_BEAT:
            continue
        for h, _mask in lst:
            for cell in h.__closure__ or ():
                v = cell.cell_contents
                if isinstance(v, dict) and "n" in v:
                    counter = v
                elif hasattr(v, "uid"):
                    wrapper_uid = v.uid
                    wrapper_pos = [float(x) for x in np.asarray(v.pos)]
    tasks = list(ctx.tasks.values())
    ent_uid = counter["uids"][-1] if counter and counter["uids"] else None
    return {
        "frame": int(eng._frame),
        "counter_n": counter["n"] if counter else None,
        "handler_sees_uid": ent_uid,
        "wrapper_uid": wrapper_uid,
        "wrapper_pos": wrapper_pos if wrapper_uid is not None else None,
        "task_n": tasks[0].state.get("n") if tasks else None,
        "n_tasks": len(tasks),
    }


def phase_a(workdir):
    from permafrost_engine_tpu.script.entity import MovableEntity
    from permafrost_engine_tpu.script.task import Task

    ctx = pf.init(_cfg(), basedir=workdir)
    e = MovableEntity("", "runner", pos=(16.0, 16.0))
    e.tags.add("hero")
    e.move((50.0, 50.0))

    counter = {"n": 0, "uids": []}

    def on_beat(arg):        # closure over counter AND the entity wrapper
        counter["n"] += 1
        counter["uids"].append(e.uid)

    pf.register_event_handler(EVT_BEAT, on_beat)

    class Beat(Task):
        def __run__(self):
            while True:
                self.state["n"] = self.state.get("n", 0) + 1
                self.effect(pf.global_event, EVT_BEAT, self.state["n"])
                yield self.sleep(3)

    Beat()

    pf.step(SAVE_FRAMES)
    pf.save_session("save.pfs")
    pf.step(RUN_FRAMES)
    return _observables(ctx)


def phase_b(workdir):
    ctx = pf.init(_cfg(), basedir=workdir)
    pf.load_session("save.pfs")
    pf.step(RUN_FRAMES)
    return _observables(ctx)


if __name__ == "__main__":
    phase, workdir = sys.argv[1], sys.argv[2]
    out = phase_a(workdir) if phase == "a" else phase_b(workdir)
    with open(os.path.join(workdir, f"out_{phase}.json"), "w") as f:
        json.dump(out, f)
