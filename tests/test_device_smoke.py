"""Opt-in real-device smoke test.

The suite forces CPU + a virtual 8-device mesh (conftest.py) for
determinism, so device-path behavior is otherwise only exercised by
bench/probes. This test closes that gap: it jits the full tick on the
ATTACHED TPU in a subprocess (the parent process's backend is already
pinned to CPU) and steps 60 frames of a small battle, checking movement
and the delta-drain pipeline work on real hardware.

Opt-in via PFTPU_DEVICE_SMOKE=1 — through the shared axon relay the
first compile costs minutes, which would dominate a default CI run.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
import jax
plat = jax.devices()[0].platform.lower()
if plat not in ("tpu", "axon"):
    print("NO-TPU", plat)
    sys.exit(3)
import numpy as np
from permafrost_engine_tpu.core.config import DiplomacyState, EngineConfig
from permafrost_engine_tpu.game.engine import Engine

eng = Engine(EngineConfig(max_ents=256))
eng.add_faction(0)
eng.add_faction(1)
eng.set_diplomacy(0, 1, DiplomacyState.WAR)
rng = np.random.default_rng(0)
a = eng.spawn_batch(
    np.stack([rng.uniform(40, 80, 32), rng.uniform(100, 140, 32)], 1)
    .astype(np.float32), faction=0, max_speed=20.0, hp=100.0)
b = eng.spawn_batch(
    np.stack([rng.uniform(160, 200, 32), rng.uniform(100, 140, 32)], 1)
    .astype(np.float32), faction=1, max_speed=20.0, hp=100.0)
p0 = np.asarray(eng.state.ents.pos)[:32].copy()
eng.move(a, (200.0, 120.0))
eng.step(60)
p1 = np.asarray(eng.state.ents.pos)[:32]
moved = np.linalg.norm(p1 - p0, axis=1)
assert (moved > 1.0).mean() > 0.9, f"units did not move: {moved}"
assert int(np.asarray(eng.state.ents.alive).sum()) == 64
print("DEVICE-SMOKE-OK", plat, float(moved.mean()))
"""


@pytest.mark.skipif(os.environ.get("PFTPU_DEVICE_SMOKE") != "1",
                    reason="opt-in: set PFTPU_DEVICE_SMOKE=1 with a TPU "
                           "attached (first compile is minutes via relay)")
def test_tick_runs_on_attached_device():
    env = dict(os.environ)
    # undo the suite's CPU forcing for the child: let the axon plugin
    # register its device as the default backend
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    res = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                         capture_output=True, text=True, timeout=1200)
    if res.returncode == 3:
        pytest.skip(f"no TPU attached: {res.stdout.strip()}")
    assert res.returncode == 0, res.stdout + res.stderr
    assert "DEVICE-SMOKE-OK" in res.stdout
