"""Unit roster (ref: scripts/rts/units/__init__.py)."""

from scripts.rts.units.animals import Chicken, Deer, Doe  # noqa: F401
from scripts.rts.units.berzerker import Berzerker  # noqa: F401
from scripts.rts.units.goblin import Goblin  # noqa: F401
from scripts.rts.units.knight import Knight  # noqa: F401
from scripts.rts.units.mage import Mage  # noqa: F401
from scripts.rts.units.sinbad import Sinbad  # noqa: F401
