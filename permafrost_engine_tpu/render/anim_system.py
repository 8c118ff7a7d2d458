"""Animation system: host clip registry + device pose batching.

Mirrors src/anim/anim.c: per-entity clip playback (idle/active clip,
LOOP/ONCE modes, finish events) with per-tick pose computation — here the
clip bookkeeping is vectorized NumPy on host (frame counters only) and
the pose palettes for ALL animated entities of a model are produced by one
batched device call (ops/pose.py), the equivalent of the shared anim
texture (ref: src/anim/anim_texture.c:93-145).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from permafrost_engine_tpu.core.events import EventType


class AnimMode:
    LOOP = 0
    ONCE = 1


ANIM_FPS = 24.0  # reference clip playback rate


@dataclasses.dataclass
class AnimState:
    model: str = ""              # pfobj path / model key
    clip: str = "idle"
    idle_clip: str = "idle"
    mode: int = AnimMode.LOOP
    t: float = 0.0               # seconds into the clip


class AnimSystem:
    def __init__(self, engine):
        self.engine = engine
        self.states: dict[int, AnimState] = {}
        self.models: dict[str, object] = {}   # model key -> PFObj

    # -- registration ------------------------------------------------------------

    def load_model(self, key: str, pfobj) -> None:
        self.models[key] = pfobj

    def register(self, uid: int, model: str = "", idle_clip: str = "idle") -> None:
        self.states[uid] = AnimState(model=model, clip=idle_clip,
                                     idle_clip=idle_clip)

    def unregister(self, uid: int) -> None:
        self.states.pop(uid, None)

    # -- playback (ref: anim.h:52-83) -----------------------------------------------

    def play(self, uid: int, clip: str, mode: int = AnimMode.LOOP) -> None:
        st = self.states[uid]
        st.clip = clip
        st.mode = mode
        st.t = 0.0

    def set_idle(self, uid: int, clip: str) -> None:
        self.states[uid].idle_clip = clip

    def current(self, uid: int) -> str:
        return self.states[uid].clip

    def tick(self, dt: float) -> None:
        """Advance clip clocks; ONCE clips fire a finish event and return
        to idle (ref: EVENT_ANIM_FINISHED)."""
        for uid, st in self.states.items():
            st.t += dt
            model = self.models.get(st.model)
            if model is None or st.clip not in getattr(model, "clips", {}):
                continue
            clip = model.clips[st.clip]
            dur = clip.frames / ANIM_FPS
            if st.t >= dur:
                if st.mode == AnimMode.ONCE:
                    self.engine.bus.notify(
                        EventType.ANIM_FINISHED,
                        {"uid": uid, "clip": st.clip}, uid=uid)
                    self.engine.bus.notify(
                        EventType.ANIM_FINISHED,
                        {"uid": uid, "clip": st.clip})
                    st.clip = st.idle_clip
                    st.mode = AnimMode.LOOP
                st.t = st.t % max(dur, 1e-6)

    # -- pose batching (device) -------------------------------------------------------

    def pose_palettes(self, model_key: str) -> np.ndarray | None:
        """Skinning palettes [N_instances, J, 4, 4] for every registered
        entity of a model — one batched device computation (the anim
        texture contents)."""
        from permafrost_engine_tpu.ops import pose as pose_ops

        model = self.models.get(model_key)
        if model is None or model.num_joints == 0:
            return None
        uids = [u for u, st in self.states.items() if st.model == model_key]
        if not uids:
            return None

        # batch sample_clip per CLIP, not per entity: instances of a model
        # share a handful of clips, so this is len(clips) device dispatches
        # per frame instead of len(uids) (the reference's anim texture
        # likewise fills all instances of a clip in one pass,
        # ref: src/anim/anim_texture.c:93-145)
        groups: dict[str, list[int]] = {}
        for row, u in enumerate(uids):
            st = self.states[u]
            cname = st.clip if st.clip in model.clips else next(
                iter(model.clips))
            groups.setdefault(cname, []).append(row)
        local_rows = [None] * len(uids)
        for cname, rows in groups.items():
            clip = model.clips[cname]
            dur = clip.frames / ANIM_FPS
            times = jnp.asarray([self.states[uids[r]].t % dur
                                 for r in rows])
            key_t = jnp.asarray(np.arange(clip.frames) / ANIM_FPS)
            local = pose_ops.sample_clip(
                key_t, jnp.asarray(clip.trans), jnp.asarray(clip.rots),
                jnp.asarray(clip.scales), times)       # [len(rows), J, ...]
            for i, r in enumerate(rows):
                local_rows[r] = local[i]
        local_mats = jnp.stack(local_rows)

        bind = pose_ops.trs_to_mat(
            jnp.asarray(model.bind_trans), jnp.asarray(model.bind_rots),
            jnp.asarray(model.bind_scales))
        # inverse bind: accumulate bind globals then invert
        levels = tuple(tuple(lvl.tolist())
                       for lvl in pose_ops.hierarchy_levels(model.joint_parents))
        parents = jnp.asarray(model.joint_parents)
        bind_glob = pose_ops.pose_palette(
            bind[None], jnp.broadcast_to(jnp.eye(4), bind[None].shape),
            parents, levels)[0]
        inv_bind = jnp.linalg.inv(bind_glob)

        return np.asarray(pose_ops.pose_palette(
            local_mats, inv_bind, parents, levels))
