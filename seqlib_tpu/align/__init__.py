from .aligner import BWAAligner, AlnReg
from .chain import Chain, chain_seeds, filter_chains
from .options import AlignerOptions
from .sharded import ShardedBWAAligner

__all__ = ["BWAAligner", "ShardedBWAAligner", "AlnReg", "Chain",
           "chain_seeds", "filter_chains", "AlignerOptions"]
