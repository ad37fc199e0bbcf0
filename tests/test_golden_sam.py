"""Golden-SAM regression pin: alignment output for the first 100
reference wgsim reads must stay byte-identical across refactors.

Regenerate intentionally with:
  python tests/regen_golden.py  (see file header of golden/sam_100.txt)
"""

import os

from seqlib_tpu.align import BWAAligner
from seqlib_tpu.index import FMIndex
from seqlib_tpu.io import FastqReader

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = "/root/reference/tests/data"


def test_golden_sam_100():
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    idx = FMIndex.construct(seqs)
    aln = BWAAligner(idx)
    hdr = idx.header_from_index()
    reads = []
    for rec in FastqReader(f"{DATA}/sim1_bcr.fq"):
        reads.append(rec)
        if len(reads) >= 100:
            break
    out = aln.align_batch([r.seq for r in reads],
                          [r.name for r in reads])
    got = []
    for recs in out:
        for r in recs:
            got.append(r.to_sam(hdr))
    expect = open(os.path.join(HERE, "golden",
                               "sam_100.txt")).read().splitlines()
    assert got == expect
