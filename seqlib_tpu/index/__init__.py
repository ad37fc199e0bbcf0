from .fmindex import FMIndex
from .pack import (Lrand48, PackedReference, both_strands, pack_sequences,
                   pac_bytes, codes_from_pac)
from .bwa_files import OCC_INTERVAL, SA_INTERVAL
from .sharded import ShardedFMIndex

__all__ = ["FMIndex", "ShardedFMIndex", "Lrand48", "PackedReference",
           "both_strands",
           "pack_sequences", "pac_bytes", "codes_from_pac",
           "OCC_INTERVAL", "SA_INTERVAL"]
