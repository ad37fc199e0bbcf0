from .aligner import BWAAligner, AlnReg
from .chain import Chain, chain_seeds, filter_chains
from .options import AlignerOptions

__all__ = ["BWAAligner", "AlnReg", "Chain", "chain_seeds", "filter_chains",
           "AlignerOptions"]
