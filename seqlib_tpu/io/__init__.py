from .bai import BaiIndex
from .bam_reader import BamReader
from .bam_writer import BamWriter, BAM, SAM, CRAM
from .bgzf import BgzfReader, BgzfWriter, is_bgzf
from .fastq import FastqReader
from .cram import CramReader, CramWriter
from .refgenome import RefGenome, build_faidx
from .threadpool import PooledBgzfWriter, ThreadPool

__all__ = ["BaiIndex", "BamReader", "BamWriter", "BAM", "SAM", "CRAM",
           "BgzfReader", "BgzfWriter", "is_bgzf", "FastqReader",
           "RefGenome", "build_faidx", "PooledBgzfWriter", "ThreadPool",
           "CramReader", "CramWriter"]
