from . import memtune  # noqa: F401  (side effect: glibc malloc tuning)
from .base import Sketch, merge_all
from .bloom import Bloom
from .countmin import CountMin, cm_dims
from .countsketch import CountSketch, cs_dims, lower_median
from .hll import HLL
from .kll import KLL
from .misra_gries import MisraGries
from .multi import MultiSketch
from .prng import MOD_P, SeedStream
from .tdigest import TDigest
from . import hashing

__all__ = [
    "Sketch",
    "merge_all",
    "Bloom",
    "CountMin",
    "cm_dims",
    "CountSketch",
    "cs_dims",
    "lower_median",
    "HLL",
    "KLL",
    "MisraGries",
    "MultiSketch",
    "TDigest",
    "SeedStream",
    "MOD_P",
    "hashing",
]
