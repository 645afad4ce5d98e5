"""cytoolz.itertoolz stand-in (see package __init__)."""
from . import groupby, sliding_window  # noqa: F401
