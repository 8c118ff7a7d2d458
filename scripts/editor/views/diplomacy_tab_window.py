"""Diplomacy tool pane (ref:
scripts/editor/views/diplomacy_tab_window.py): faction roster with an
add form (name + color), and a pairwise war/peace matrix."""

import permafrost_engine_tpu.script.pf as pf

from scripts.editor.constants import (
    UI_LEFT_PANE_WIDTH,
    UI_TAB_BAR_HEIGHT,
)


class DiplomacyTabWindow(pf.Window):

    def __init__(self):
        super().__init__(
            "DiplomacyTab",
            (0, UI_TAB_BAR_HEIGHT, UI_LEFT_PANE_WIDTH,
             1080 - UI_TAB_BAR_HEIGHT),
            pf.NK_WINDOW_BORDER)

    def update(self):
        facs = pf.get_factions_list()
        self.layout_row_dynamic(20, 1)
        self.label("Factions:")
        for fac in facs:
            self.layout_row_dynamic(20, 1)
            self.label(f"  [{fac['id']}] {fac['name']}")

        self.layout_row_dynamic(20, 1)
        self.label("New faction:")
        self.layout_row_dynamic(26, 1)
        name = self.text_edit("new_fac_name", "")
        self.layout_row_dynamic(28, 1)
        if self.button_label("Add Faction") and name:
            pf.add_faction(name, (200, 200, 200))
            self._widget_state[("text", "new_fac_name")] = ""

        self.layout_row_dynamic(20, 1)
        self.label("Diplomacy (click to toggle):")
        for i, a in enumerate(facs):
            for b in facs[i + 1:]:
                state = pf.get_diplomacy_state(a["id"], b["id"])
                at_war = state == pf.DIPLOMACY_STATE_WAR
                self.layout_row_dynamic(22, 1)
                label = (f"{a['name']} vs {b['name']}: "
                         f"{'WAR' if at_war else 'PEACE'}")
                if self.button_label(label):
                    pf.set_diplomacy_state(
                        a["id"], b["id"],
                        pf.DIPLOMACY_STATE_PEACE if at_war
                        else pf.DIPLOMACY_STATE_WAR)
