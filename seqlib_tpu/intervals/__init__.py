from .collection import GRC, GenomicRegionCollection
from .tree import IntervalIndex

__all__ = ["GRC", "GenomicRegionCollection", "IntervalIndex"]
