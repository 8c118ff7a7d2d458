"""Runtime performance HUD (ref:
scripts/common/views/perf_stats_window.py). The reference shows a
per-function tree with hardware counters (IPC, cache misses); the TPU
engine's equivalents are host perf scopes plus device-tick attribution
(ms / FLOPs / MFU from XLA cost analysis), so the rows show those."""

import permafrost_engine_tpu.script.pf as pf


class PerfStatsWindow(pf.Window):

    WIDTH = 420
    HEIGHT = 360

    def __init__(self):
        super().__init__(
            "Performance",
            (1920 - self.WIDTH - 10, 10, self.WIDTH, self.HEIGHT),
            pf.NK_WINDOW_BORDER | pf.NK_WINDOW_TITLE
            | pf.NK_WINDOW_MOVABLE | pf.NK_WINDOW_CLOSABLE,
            resize_mask=pf.ANCHOR_X_RIGHT | pf.ANCHOR_Y_TOP)
        self.device_stats: dict = {}

    @property
    def hidden(self) -> bool:
        return not self.shown

    def update(self):
        self.layout_row_dynamic(20, 2)
        self.label("Frame ms:")
        self.label(f"{pf.prev_frame_ms():.2f}")

        self.layout_row_dynamic(20, 1)
        self.label_colored("Host scopes (ms):", 100, 180, 255)
        for entry in pf.prev_frame_perfstats():
            self.layout_row_dynamic(18, 2)
            self.label(f"  {entry['name']}")
            self.label(f"{entry['ms']:.2f}")

        if self.device_stats:
            self.layout_row_dynamic(20, 1)
            self.label_colored("Device tick:", 100, 180, 255)
            for key in ("ms_p50", "tick_flops", "mfu_pct"):
                if key in self.device_stats:
                    self.layout_row_dynamic(18, 2)
                    self.label(f"  {key}")
                    self.label(f"{self.device_stats[key]}")

        mem = pf.prev_frame_vramstats()
        self.layout_row_dynamic(20, 2)
        self.label("HBM state bytes:")
        self.label(f"{mem.get('hbm_state_bytes', 0):,}")

        self.layout_row_dynamic(26, 1)
        if self.button_label("Refresh Device Stats"):
            self.device_stats = pf.context().engine.profile_tick(5)

        self.layout_row_dynamic(26, 1)
        if self.button_label("Hide"):
            self.hide()
