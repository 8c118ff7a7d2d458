"""Terrain paint controller (ref:
scripts/editor/view_controllers/terrain_tab_vc.py): world clicks while
the terrain tab is active paint a brush-sized square of tiles — height,
material or pathability — into the active MapData through ONE batched
pf.update_tiles re-bake per stroke."""

import permafrost_engine_tpu.script.pf as pf

import scripts.editor.globals as eg
import scripts.editor.mouse_events as mouse_events
from scripts.common.view_controllers.view_controller import ViewController
from scripts.editor.views.terrain_tab_window import BRUSH_SIZES


class TerrainTabVC(ViewController):

    def __init__(self, view):
        self.view = view

    def _sync_materials(self):
        if eg.active_map is not None:
            self.view.mat_names = [name for name, _ in
                                   eg.active_map.materials] or ["default"]

    def _on_click(self, event):
        if event["button"] != 1 or event["consumed"] != "select":
            return                       # UI clicks stay UI clicks
        if not mouse_events.mouse_over_map or eg.active_map is None:
            return
        vw, vh = pf.context().ui.virtual_resolution
        hit = pf.get_active_camera().ground_point(
            event["pos"][0], event["pos"][1], vw, vh)
        if hit is None:
            return
        from permafrost_engine_tpu.core.config import (
            TILES_PER_CHUNK,
            UNITS_PER_TILE,
        )
        m = eg.active_map
        tr = int(hit[2] // UNITS_PER_TILE)
        tc = int(hit[0] // UNITS_PER_TILE)
        size = BRUSH_SIZES[self.view.brush_size_idx]
        half = size // 2
        updates = []
        for r in range(tr - half, tr + half + 1):
            for c in range(tc - half, tc + half + 1):
                if not (0 <= r < m.tiles_h and 0 <= c < m.tiles_w):
                    continue
                if self.view.brush_mode_idx == 0:      # height
                    tile = {"base_height": self.view.height}
                elif self.view.brush_mode_idx == 1:    # material
                    tile = {"top_mat_idx": self.view.mat_idx}
                else:                                  # blockers
                    tile = {"pathable": self.view.pathable}
                updates.append(((r // TILES_PER_CHUNK, c // TILES_PER_CHUNK),
                                (r % TILES_PER_CHUNK, c % TILES_PER_CHUNK),
                                tile))
        pf.update_tiles(updates)

    def activate(self):
        self._sync_materials()
        pf.register_ui_event_handler(pf.SDL_MOUSEBUTTONDOWN, self._on_click)
        self.view.show()

    def deactivate(self):
        self.view.hide()
        pf.unregister_event_handler(pf.SDL_MOUSEBUTTONDOWN, self._on_click)
