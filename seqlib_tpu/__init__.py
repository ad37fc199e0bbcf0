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

__all__ = ["BamHeader", "BamRecord", "Cigar", "CigarField", "GenomicRegion",
           "HeaderSequence", "UnalignedSequence", "__version__"]
