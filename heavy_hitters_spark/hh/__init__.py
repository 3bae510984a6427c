from .dyadic import DyadicHH

__all__ = ["DyadicHH"]
