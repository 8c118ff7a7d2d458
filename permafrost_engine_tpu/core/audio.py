"""Audio subsystem (headless): music playlists, effect channels,
positional 3D effects tied to entities.

Mirrors the reference's OpenAL layer state machine (ref: src/audio/
al_audio.c, al_effect.c; API audio.h:45-68): playlist modes, 4 foreground
effect channels, per-entity positional effects, pause/resume with time
delta, and save/load. There is no audio device in this environment, so
playback is modelled (track positions advance with the tick clock) — the
full state surface exists for scripts and session save.
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum


class PlaybackMode(IntEnum):
    MUSIC_MODE_LOOP = 0
    MUSIC_MODE_PLAYLIST = 1
    MUSIC_MODE_SHUFFLE = 2


NUM_FG_CHANNELS = 4  # ref: audio.h foreground effect channels


@dataclasses.dataclass
class EffectChannel:
    name: str | None = None
    started_tick: int = 0


@dataclasses.dataclass
class PositionalEffect:
    name: str
    pos: tuple
    uid: int | None = None
    started_tick: int = 0


class AudioSystem:
    def __init__(self):
        self.tracks: list[str] = []     # "loaded" music library
        self.effects: set[str] = set()  # known effect names
        self.mode = PlaybackMode.MUSIC_MODE_LOOP
        self.current: str | None = None
        self.playing = False
        self.master_volume = 1.0
        self.music_volume = 1.0
        self.effect_volume = 1.0
        self.mute_on_focus_loss = False
        self.channels = [EffectChannel() for _ in range(NUM_FG_CHANNELS)]
        self.positional: list[PositionalEffect] = []
        self._tick = 0
        self._paused_at: int | None = None

    # -- music ----------------------------------------------------------------

    def add_tracks(self, names: list[str]) -> None:
        self.tracks.extend(n for n in names if n not in self.tracks)

    def play_music(self, name: str) -> bool:
        if self.tracks and name not in self.tracks:
            self.tracks.append(name)
        self.current = name
        self.playing = True
        return True

    def curr_music(self) -> str | None:
        return self.current

    def all_music(self) -> list[str]:
        return list(self.tracks)

    # -- effects ---------------------------------------------------------------

    def play_global_effect(self, name: str, interrupt: bool = False,
                           channel: int = 0) -> bool:
        ch = self.channels[channel % NUM_FG_CHANNELS]
        if ch.name is not None and not interrupt:
            return False
        ch.name = name
        ch.started_tick = self._tick
        return True

    def play_effect(self, name: str, pos, uid: int | None = None) -> bool:
        self.positional.append(
            PositionalEffect(name, tuple(pos), uid, self._tick))
        return True

    # -- clock / pause (ref: pause/resume with time delta) ----------------------

    def tick(self, n: int = 1) -> None:
        if self._paused_at is None:
            self._tick += n
            # expire foreground/positional effects after ~2s
            for ch in self.channels:
                if ch.name and self._tick - ch.started_tick > 120:
                    ch.name = None
            self.positional = [
                p for p in self.positional if self._tick - p.started_tick <= 120]

    def pause(self) -> None:
        if self._paused_at is None:
            self._paused_at = self._tick

    def resume(self) -> None:
        self._paused_at = None

    # -- save/load ----------------------------------------------------------------

    def snapshot(self) -> dict:
        return {
            "tracks": list(self.tracks), "mode": int(self.mode),
            "current": self.current, "playing": self.playing,
            "volumes": (self.master_volume, self.music_volume,
                        self.effect_volume),
            "tick": self._tick,
        }

    def restore(self, snap: dict) -> None:
        self.tracks = list(snap["tracks"])
        self.mode = PlaybackMode(snap["mode"])
        self.current = snap["current"]
        self.playing = snap["playing"]
        (self.master_volume, self.music_volume,
         self.effect_volume) = snap["volumes"]
        self._tick = snap["tick"]
