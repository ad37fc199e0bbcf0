"""The reference README's worked examples, in seqlib_tpu.

Mirrors /root/reference/README.md:124-175 (BASELINE.md config 1:
targeted realignment against an in-memory index of a small region).
Run: python examples/readme_examples.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from seqlib_tpu import (BWAAligner, BamReader, BamWriter, FMIndex,
                        RefGenome, UnalignedSequence)

DATA = "/root/reference/tests/data"


def targeted_realignment():
    """Targeted re-alignment of reads to a given region with BWA-MEM."""
    ref = RefGenome(f"{DATA}/tiny.fa")

    # get sequence at a given locus
    seq = ref.query_region("bcr", 1_000, 2_000)

    # make an in-memory BWA-MEM index of the region
    idx = FMIndex.construct([("chr_reg1", seq)])
    bwa = BWAAligner(idx)

    # align an example string (a slice of the region with a clip tail)
    query = seq[200:340] + "GGTTGGTTAA"
    results = bwa.align_sequence(query, "my_seq", hardclip=False,
                                 keep_sec_frac=0.9, max_secondary=10)
    hdr = idx.header_from_index()
    for r in results:
        print(r.to_sam(hdr))
    return results


def realign_bam(in_bam: str, out_bam: str):
    """Read a BAM line by line, realign reads, write to a new BAM."""
    reader = BamReader(in_bam)
    idx = FMIndex.construct(
        [(s.name, s.seq) for s in
         __import__("seqlib_tpu.io", fromlist=["FastqReader"])
         .FastqReader(f"{DATA}/tiny.fa")])
    bwa = BWAAligner(idx)

    writer = BamWriter()  # or BamWriter(SAM) / BamWriter(CRAM)
    writer.open(out_bam)
    writer.set_header(idx.header_from_index())
    writer.write_header()

    for rec in iter(reader.next, None):
        results = bwa.align_sequence(rec.seq, rec.qname, hardclip=False,
                                     keep_sec_frac=0.90, max_secondary=10)
        for r in results:
            writer.write_record(r)
    writer.close()


if __name__ == "__main__":
    rs = targeted_realignment()
    print(f"{len(rs)} alignment(s)")
