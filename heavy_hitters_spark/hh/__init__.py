from .const_sketch import ConstSketchHH
from .dyadic import DyadicHH

__all__ = ["DyadicHH", "ConstSketchHH"]
