"""Floating combat-text style overlay (ref:
scripts/common/disappearing_text_task.py): draws fading, rising text for
`duration` ms via pf.draw_text, one frame at a time through the task
scheduler's frame event."""

import permafrost_engine_tpu.script.pf as pf


class DisappearingTextTask(pf.Task):

    def __run__(self):
        text, bounds, color, duration = self._args[:4]
        travel = self._args[4] if len(self._args) > 4 else 50
        elapsed = 0.0
        while elapsed < duration:
            frac = elapsed / float(duration)
            b = (bounds[0], int(bounds[1] - travel * frac),
                 bounds[2], bounds[3])
            c = tuple(list(color[:3]) + [int(color[3] * (1.0 - frac))])
            pf.draw_text(text, b, c)
            yield self.await_event(pf.EVENT_UPDATE_START)
            elapsed += max(pf.prev_frame_ms(), 1000.0 / 60.0)
