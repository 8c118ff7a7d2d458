"""Cross-process whole-session restore — the py_pickle.c marquee test.

Process A runs a live scenario (moving entity, closure event handler over
a shared counter + entity wrapper, a mid-execution pf.Task fiber firing
script events), saves at frame 30, and keeps running to frame 90.
Process B is a FRESH interpreter that restores from the blob alone and
runs the same 60 frames. Every observable — frame count, the closure's
counter, the entity wrapper the closure captured, the task's state — must
match A's uninterrupted run (ref: /root/reference/src/script/py_pickle.c
whole-interpreter pickling + src/session.c:176-233 fresh-process load +
py_task.c:654 mid-execution fiber resume).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

DRIVER = os.path.join(os.path.dirname(__file__), "_fresh_process_driver.py")


def _run(phase: str, workdir: str) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, DRIVER, phase, workdir],
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, f"phase {phase} failed:\n{r.stdout}\n{r.stderr}"
    with open(os.path.join(workdir, f"out_{phase}.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("fresh_process"))
    a = _run("a", workdir)
    b = _run("b", workdir)
    return a, b


def test_fresh_process_frame_and_task(runs):
    a, b = runs
    assert a["frame"] == 90
    assert b["frame"] == 90
    # the fiber resumed MID-EXECUTION at its saved phase: same beat count
    assert a["n_tasks"] == b["n_tasks"] == 1
    assert a["task_n"] == b["task_n"]
    assert a["task_n"] >= 25            # ~1 beat / 3 ticks over 90 frames


def test_fresh_process_closure_handler(runs):
    a, b = runs
    # the closure handler survived: restored with its saved counter value
    # and kept firing on post-load beats, landing where A's did
    assert b["counter_n"] == a["counter_n"]
    assert b["counter_n"] >= 25
    # the wrapper captured in the closure still resolves entities
    assert b["handler_sees_uid"] == a["handler_sees_uid"]
    assert b["wrapper_uid"] == a["wrapper_uid"]


def test_fresh_process_sim_bit_identical(runs):
    a, b = runs
    # B's 60 restored frames reproduce A's uninterrupted trajectory
    assert np.allclose(a["wrapper_pos"], b["wrapper_pos"], atol=1e-5), \
        (a["wrapper_pos"], b["wrapper_pos"])
