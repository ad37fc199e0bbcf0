"""seqlib_tpu: a TPU-native read-alignment and assembly framework.

A from-scratch rebuild of the capabilities of walaj/SeqLib (C++ /
HTSlib / BWA-MEM / fermi-lite) designed TPU-first:

* host data plane (this package's ``io``/``core``/``intervals``/
  ``filters`` modules): BAM/SAM/FASTQ/FASTA codecs, record model,
  interval engine, filter engine;
* device compute plane (``index``/``align``/``assembly``/``ops``):
  FM-index construction + rank/SMEM seeding, banded Smith-Waterman
  wavefront kernels (Pallas), k-mer counting / error correction as
  JAX sort/segment-reduce pipelines;
* orchestration (``parallel``): jax.sharding meshes, shard_map
  data-parallel batch dispatch, collectives for stats merging.
"""

__version__ = "0.1.0"

from .core import (BamHeader, BamRecord, Cigar, CigarField, GenomicRegion,
                   HeaderSequence, UnalignedSequence)


def __getattr__(name):
    """Lazy subsystem access: seqlib_tpu.BWAAligner etc. without eagerly
    importing jax at package import."""
    lazy = {
        "FMIndex": ("seqlib_tpu.index", "FMIndex"),
        "BWAAligner": ("seqlib_tpu.align", "BWAAligner"),
        "AlignerOptions": ("seqlib_tpu.align", "AlignerOptions"),
        "BamReader": ("seqlib_tpu.io", "BamReader"),
        "BamWriter": ("seqlib_tpu.io", "BamWriter"),
        "FastqReader": ("seqlib_tpu.io", "FastqReader"),
        "RefGenome": ("seqlib_tpu.io", "RefGenome"),
        "GRC": ("seqlib_tpu.intervals", "GRC"),
        "GenomicRegionCollection": ("seqlib_tpu.intervals",
                                    "GenomicRegionCollection"),
        "BFC": ("seqlib_tpu.assembly", "BFC"),
        "FermiAssembler": ("seqlib_tpu.assembly", "FermiAssembler"),
        "ReadFilterCollection": ("seqlib_tpu.filters",
                                 "ReadFilterCollection"),
        "SeqPlot": ("seqlib_tpu.plot", "SeqPlot"),
        "BamStats": ("seqlib_tpu.stats", "BamStats"),
        "STCoverage": ("seqlib_tpu.stats", "STCoverage"),
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = ["BamHeader", "BamRecord", "Cigar", "CigarField", "GenomicRegion",
           "HeaderSequence", "UnalignedSequence", "FMIndex", "BWAAligner",
           "AlignerOptions", "BamReader", "BamWriter", "FastqReader",
           "RefGenome", "GRC", "GenomicRegionCollection", "BFC",
           "FermiAssembler", "ReadFilterCollection", "SeqPlot", "BamStats",
           "STCoverage", "__version__"]
