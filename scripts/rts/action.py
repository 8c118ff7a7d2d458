"""Action-pad slot descriptor (ref: scripts/rts/action.py)."""


class ActionDesc:

    def __init__(self, icon_normal, icon_hover, icon_active, action,
                 hotkey=None, label=""):
        self.icon_normal = icon_normal
        self.icon_hover = icon_hover
        self.icon_active = icon_active
        self.action = action
        self.hotkey = hotkey
        self.label = label or icon_normal
