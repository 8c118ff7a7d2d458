"""Core runtime: settings, event bus, cooperative scheduler."""

import pytest

from permafrost_engine_tpu.core.events import (
    ES_ALL,
    ES_PAUSED_FULL,
    ES_RUNNING,
    EventBus,
    EventType,
)
from permafrost_engine_tpu.core.sched import (
    AwaitEvent,
    Receive,
    Register,
    Reply,
    Scheduler,
    Send,
    Sleep,
    WhoIs,
    Yield,
)
from permafrost_engine_tpu.core.settings import Settings, SettingsError, SettingType
from permafrost_engine_tpu.core.config import SimState


# ---------------------------------------------------------------------------
# settings
# ---------------------------------------------------------------------------


def test_settings_roundtrip(tmp_path):
    s = Settings()
    committed = []
    s.create("pf.video.vsync", SettingType.BOOL, True,
             commit=lambda v: committed.append(v))
    s.create("pf.game.movement_hz", SettingType.INT, 20,
             validate=lambda v: v in (20, 10, 5, 1))
    s.create("pf.video.resolution", SettingType.VEC2, [1920, 1080])

    assert s.get("pf.video.vsync") is True
    assert committed == [True]
    s.set("pf.video.vsync", False)
    assert committed == [True, False]

    with pytest.raises(SettingsError):
        s.set("pf.game.movement_hz", 7)      # validation
    with pytest.raises(SettingsError):
        s.set("pf.game.movement_hz", "20")   # type
    with pytest.raises(SettingsError):
        s.get("pf.nope")

    path = str(tmp_path / "settings.json")
    s.save_to_file(path)

    s2 = Settings()
    s2.load_from_file(path)
    # value applied at registration time (priority-ordered load)
    s2.create("pf.video.vsync", SettingType.BOOL, True)
    assert s2.get("pf.video.vsync") is False


# ---------------------------------------------------------------------------
# events
# ---------------------------------------------------------------------------


def test_event_queue_and_masks():
    bus = EventBus()
    got = []
    bus.subscribe(EventType.MOTION_END, lambda a: got.append(("run", a)),
                  mask=ES_RUNNING)
    bus.subscribe(EventType.MOTION_END, lambda a: got.append(("all", a)),
                  mask=ES_ALL)

    bus.notify(EventType.MOTION_END, 42)
    assert bus.queued_this_frame(EventType.MOTION_END)
    assert got == []                       # queued, not delivered yet

    bus.service_queue(SimState.PAUSED_FULL)
    assert got == [("all", 42)]            # RUNNING-masked handler skipped

    bus.notify(EventType.MOTION_END, 43)
    bus.service_queue(SimState.RUNNING)
    assert got == [("all", 42), ("run", 43), ("all", 43)]


def test_event_per_entity_and_unsubscribe():
    bus = EventBus()
    got = []
    h = lambda a: got.append(a)
    bus.subscribe(EventType.ENTITY_DEATH, h, uid=7)
    bus.notify_immediate(EventType.ENTITY_DEATH, "x", uid=7)
    bus.notify_immediate(EventType.ENTITY_DEATH, "y", uid=8)
    assert got == ["x"]
    bus.unsubscribe_entity(7)
    bus.notify_immediate(EventType.ENTITY_DEATH, "z", uid=7)
    assert got == ["x"]


# ---------------------------------------------------------------------------
# scheduler
# ---------------------------------------------------------------------------


def test_sched_send_receive_reply():
    sched = Scheduler()
    log = []

    def server(task):
        yield Register("echo")
        while True:
            msg, sender = yield Receive()
            if msg == "quit":
                return
            yield Reply(sender, msg * 2)

    def client(task):
        tid = yield WhoIs("echo")
        reply = yield Send(tid, 21)
        log.append(reply)
        yield Send(tid, "quit")

    sched.create(server)
    sched.create(client)
    for _ in range(10):
        sched.tick()
    assert log == [42]
    assert not sched.tasks  # both finished and reaped


def test_sched_sleep_and_yield():
    sched = Scheduler()
    log = []

    def sleeper(task):
        log.append("a")
        yield Sleep(3)
        log.append("b")
        yield Yield()
        log.append("c")

    sched.create(sleeper)
    sched.tick()
    assert log == ["a"]
    sched.tick()
    sched.tick()
    assert log == ["a"]
    sched.tick()          # wake after 3 ticks
    assert log == ["a", "b"]
    sched.tick()
    assert log == ["a", "b", "c"]


def test_sched_await_event():
    sched = Scheduler()
    log = []

    def waiter(task):
        arg = yield AwaitEvent(EventType.MOTION_END)
        log.append(arg)

    sched.create(waiter)
    sched.tick()
    assert log == []
    sched.post_event(EventType.MOTION_END, {"uid": 5})
    sched.tick()
    assert log == [{"uid": 5}]


def test_sched_task_state_is_picklable():
    import pickle
    sched = Scheduler()

    def t(task):
        task.state["progress"] = 3
        yield Yield()

    tid = sched.create(t)
    sched.tick()
    blob = pickle.dumps(sched.tasks[tid].state)
    assert pickle.loads(blob) == {"progress": 3}


def test_audio_mixdown_wav(tmp_path):
    """Offline OpenAL-output analogue: positional attenuation + panning
    into a stereo WAV (ref: src/audio/al_effect.c positional sources)."""
    import wave

    import numpy as np

    from permafrost_engine_tpu.core.audio import AudioSystem

    au = AudioSystem()
    au.play_music("theme")
    au.play_global_effect("horn")
    au.play_effect("clang", (30.0, 0.0))        # east of the listener
    p = str(tmp_path / "mix.wav")
    n = au.render_wav(p, seconds=1.0, listener_pos=(0.0, 10.0, 0.0))
    assert n == 3
    with wave.open(p, "rb") as w:
        assert w.getnchannels() == 2
        assert w.getframerate() == AudioSystem.SAMPLE_RATE
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    pcm = pcm.reshape(-1, 2).astype(np.float32)
    assert np.abs(pcm).max() > 1000              # audible signal
    # a positional-only mix pans right for an eastern source
    au2 = AudioSystem()
    au2.play_effect("clang", (30.0, 0.0))
    p2 = str(tmp_path / "pan.wav")
    au2.render_wav(p2, seconds=0.5, listener_pos=(0.0, 10.0, 0.0))
    with wave.open(p2, "rb") as w:
        pcm2 = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    pcm2 = pcm2.reshape(-1, 2).astype(np.float32)
    assert np.abs(pcm2[:, 1]).mean() > np.abs(pcm2[:, 0]).mean() * 1.2
    # attenuation: a distant copy is quieter
    au3 = AudioSystem()
    au3.play_effect("clang", (300.0, 0.0))
    p3 = str(tmp_path / "far.wav")
    au3.render_wav(p3, seconds=0.5, listener_pos=(0.0, 10.0, 0.0))
    with wave.open(p3, "rb") as w:
        pcm3 = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert np.abs(pcm3.astype(np.float32)).mean() < \
        np.abs(pcm2).mean() * 0.5
    # an effect started in the past resumes mid-source
    au4 = AudioSystem()
    au4.play_global_effect("horn")
    au4.tick(60)                                  # one second elapses
    p4 = str(tmp_path / "late.wav")
    au4.render_wav(p4, seconds=0.5)
    with wave.open(p4, "rb") as w:
        pcm4 = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    au5 = AudioSystem()
    au5.play_global_effect("horn")
    p5 = str(tmp_path / "fresh.wav")
    au5.render_wav(p5, seconds=0.5)
    with wave.open(p5, "rb") as w:
        pcm5 = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    # the late window catches the decayed tail -> quieter than the onset
    assert np.abs(pcm4.astype(np.float32)).mean() < \
        np.abs(pcm5.astype(np.float32)).mean()
