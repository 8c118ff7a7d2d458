"""The trace/log half of the pf.debug.* surface actually does something.

The overlay settings are covered by tests/test_debug_overlays.py; these
cover the observability settings (ref: the reference's debug settings in
src/main.c:337-350 frame stepping, perf.h GPU tracing, py_script.c
script tracing, mem.h accounting, render logging)."""

import jax
import numpy as np
import pytest

from permafrost_engine_tpu.core.config import EngineConfig, SimState
from permafrost_engine_tpu.script import pf
from permafrost_engine_tpu.script.constants import SDL_SCANCODES


@pytest.fixture()
def ctx():
    cfg = EngineConfig(max_ents=64, chunks_r=2, chunks_c=2, num_layers=1,
                       max_flocks=8, max_projectiles=8,
                       field_slab_slots=16, los_slab_slots=16)
    return pf.init(cfg)


def test_paused_frame_step(ctx):
    eng = ctx.engine
    u = eng.spawn_batch(np.array([[50.0, 50.0]], np.float32))
    assert u
    pf.settings_set("pf.debug.paused_frame_step_enabled", True)
    pf.set_simstate(int(SimState.PAUSED_FULL))
    t0 = int(np.asarray(eng.state.tick))
    f0 = eng._frame
    pf.inject_key_down(SDL_SCANCODES["SPACE"])
    pf.inject_key_up(SDL_SCANCODES["SPACE"])
    assert eng._frame == f0 + 1
    assert int(np.asarray(eng.state.tick)) == t0 + 1
    assert eng.sim_state == SimState.PAUSED_FULL  # still paused after
    # with the setting off, SPACE does not step
    pf.settings_set("pf.debug.paused_frame_step_enabled", False)
    pf.inject_key_down(SDL_SCANCODES["SPACE"])
    assert eng._frame == f0 + 1


def test_trace_python_records_handler_dispatch(ctx):
    eng = ctx.engine
    pf.settings_set("pf.debug.trace_python", True)
    hits = []

    def handler(arg):
        hits.append(arg)

    from permafrost_engine_tpu.core.events import EventType
    eng.bus.subscribe(int(EventType.NEW_GAME), handler)
    eng.bus.notify_immediate(int(EventType.NEW_GAME), {"x": 1})
    assert hits
    assert any("handler" in rec[2] for rec in eng.bus.trace_log)
    # off -> no further records
    n = len(eng.bus.trace_log)
    pf.settings_set("pf.debug.trace_python", False)
    eng.bus.notify_immediate(int(EventType.NEW_GAME), {"x": 2})
    assert len(eng.bus.trace_log) == n


def test_log_mem_stats_and_call_graphs(ctx):
    eng = ctx.engine
    pf.settings_set("pf.debug.log_mem_stats", True)
    pf.settings_set("pf.debug.log_call_graphs", True)
    eng.step(eng.economy_period)
    assert eng.mem_stats_log, "mem stats not recorded"
    frame, stats = eng.mem_stats_log[-1]
    assert stats and all(int(v) >= 0 for v in stats.values())
    assert eng.call_graph_log
    names = {n for seg in eng.call_graph_log for (n, _ms, _p) in seg}
    assert "device_tick" in names


def test_trace_gpu_counters(ctx):
    eng = ctx.engine
    pf.settings_set("pf.debug.trace_gpu", True)
    pf.settings_set("pf.debug.trace_gpu_stalls", True)
    eng.step(6)
    assert eng.perf.counters.get("trace_gpu_device_ms", 0.0) > 0.0


def test_render_log_mask(ctx, tmp_path):
    eng = ctx.engine
    eng.spawn_batch(np.array([[60.0, 60.0]], np.float32))
    pf.settings_set("pf.debug.render_log_mask", 3)
    assert pf.dump_framebuffer(str(tmp_path / "f.npy"))
    renderers = getattr(eng, "_scene_renderers", {})
    assert renderers, "render_frame did not cache a renderer"
    rend = next(iter(renderers.values()))
    assert rend.render_log
    entry = rend.render_log[-1]
    assert "raster_ms" in entry and "triangles" in entry
