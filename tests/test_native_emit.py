"""Native record-emission parity (native/bamenc.cpp).

The C++ columnar encoder must be BYTE-identical to the Python object
path (aligner._assemble_records + io.bam.encode_record / to_sam) under
every option combination the reference API exposes: hardclip,
keepSecFrac, maxSecondary (BWAAligner.cpp:133-241), plus XA emission.
Corpora: the reference's wgsim reads (clip/fusion/indel records) and
the repeat-heavy synthetic (XA/mapq-0/multimap records).
"""

import os
import sys

import numpy as np
import pytest

from seqlib_tpu import native
from seqlib_tpu.align import BWAAligner
from seqlib_tpu.index import FMIndex
from seqlib_tpu.io import FastqReader
from seqlib_tpu.io.bam import decode_record, encode_record

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def tiny_aln():
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    idx = FMIndex.construct(seqs)
    return BWAAligner(idx)


@pytest.fixture(scope="module")
def wgsim_reads():
    out = []
    for rec in FastqReader(f"{DATA}/sim1_bcr.fq"):
        out.append((rec.name, rec.seq))
        if len(out) >= 1000:
            break
    return out


@pytest.fixture(scope="module")
def repeat_setup():
    import regen_golden as rg
    genome = rg.make_repeat_genome()
    idx = FMIndex.construct([("rep1", genome)])
    return BWAAligner(idx), rg.make_repeat_reads(genome)


def _python_payload(aln, reads, sam=False, **kw):
    hdr = aln.index.header_from_index()
    recs = aln.align_batch([s for _, s in reads],
                           [n for n, _ in reads], **kw)
    payload = bytearray()
    for rl in recs:
        for r in rl:
            if sam:
                payload += r.to_sam(hdr).encode() + b"\n"
            else:
                payload += encode_record(r)
    counts = np.array([len(rl) for rl in recs], np.int32)
    return bytes(payload), counts


def _assert_parity(aln, reads, sam=False, **kw):
    want, want_counts = _python_payload(aln, reads, sam=sam, **kw)
    got, got_counts = aln.align_batch_bam(
        [s for _, s in reads], [n for n, _ in reads], sam=sam, **kw)
    assert np.array_equal(got_counts, want_counts)
    assert got == want


def test_bam_parity_wgsim(tiny_aln, wgsim_reads):
    _assert_parity(tiny_aln, wgsim_reads)


def test_sam_parity_wgsim(tiny_aln, wgsim_reads):
    _assert_parity(tiny_aln, wgsim_reads, sam=True)


def test_bam_parity_hardclip(tiny_aln, wgsim_reads):
    _assert_parity(tiny_aln, wgsim_reads[:300], hardclip=True)


def test_bam_parity_filters(tiny_aln, wgsim_reads):
    # invalid keepSecFrac drops secondaries entirely (reference
    # semantics); maxSecondary=0 keeps primaries only
    _assert_parity(tiny_aln, wgsim_reads[:300], keep_sec_frac=2.0)
    _assert_parity(tiny_aln, wgsim_reads[:300], max_secondary=0)
    _assert_parity(tiny_aln, wgsim_reads[:300], keep_sec_frac=1.0)


def test_bam_parity_repeat_corpus(repeat_setup):
    # XA-heavy: exact-duplicate loci, divergent copies, tandem repeats
    aln, reads = repeat_setup
    _assert_parity(aln, reads)


def test_sam_parity_repeat_corpus(repeat_setup):
    aln, reads = repeat_setup
    _assert_parity(aln, reads[:500], sam=True)


def test_bam_parity_repeat_hardclip(repeat_setup):
    aln, reads = repeat_setup
    _assert_parity(aln, reads[500:700], hardclip=True)


def test_unmapped_reads_zero_counts(tiny_aln):
    rng = np.random.default_rng(3)
    reads = [(f"rand_{i}",
              "".join("ACGT"[c] for c in rng.integers(0, 4, 150)))
             for i in range(8)]
    payload, counts = tiny_aln.align_batch_bam(
        [s for _, s in reads], [n for n, _ in reads])
    # random 150-mers essentially never align to the 355 kb genome
    assert counts.sum() == 0 and payload == b""


def test_decoded_records_roundtrip(tiny_aln, wgsim_reads):
    """Native payload must decode back through the BAM record codec."""
    payload, counts = tiny_aln.align_batch_bam(
        [s for _, s in wgsim_reads[:100]],
        [n for n, _ in wgsim_reads[:100]])
    import struct
    off, n = 0, 0
    while off < len(payload):
        (sz,) = struct.unpack_from("<i", payload, off)
        rec = decode_record(payload[off + 4:off + 4 + sz])
        assert rec.qual is None and "AS" in rec.tags
        off += 4 + sz
        n += 1
    assert n == counts.sum()


def test_payload_through_bamwriter_roundtrip(tiny_aln, wgsim_reads,
                                             tmp_path):
    """Full production chain: align -> native payload ->
    BamWriter.write_records_bytes (native MT BGZF deflate) -> BamReader
    gives records identical to the object path."""
    from seqlib_tpu.io.bam_reader import BamReader
    from seqlib_tpu.io.bam_writer import BamWriter, BAM

    reads = wgsim_reads[:400]
    payload, counts = tiny_aln.align_batch_bam(
        [s for _, s in reads], [n for n, _ in reads])
    path = str(tmp_path / "native.bam")
    w = BamWriter(BAM)
    assert w.open(path)
    w.set_header(tiny_aln.index.header_from_index())
    w.write_records_bytes(payload)
    w.close()
    rd = BamReader()
    assert rd.open(path)
    got = []
    while True:
        r = rd.next()
        if r is None:
            break
        got.append(r)
    want = [r for rl in tiny_aln.align_batch(
        [s for _, s in reads], [n for n, _ in reads]) for r in rl]
    assert len(got) == len(want) == counts.sum()
    for a, b in zip(got, want):
        assert (a.qname, a.tid, a.pos, a.mapq, a.flag, str(a.cigar),
                a.seq, a.tags) == \
            (b.qname, b.tid, b.pos, b.mapq, b.flag, str(b.cigar),
             b.seq, b.tags)


def test_stream_bam_matches_batch(tiny_aln, wgsim_reads):
    class _R:
        def __init__(self, n, s):
            self.name, self.seq = n, s

    reads = [_R(n, s) for n, s in wgsim_reads[:600]]
    want, want_counts = tiny_aln.align_batch_bam(
        [r.seq for r in reads], [r.name for r in reads])
    got = bytearray()
    got_counts = []
    for chunk, payload, counts in tiny_aln.align_stream_bam(
            iter(reads), batch_size=600, workers=2):
        got += payload
        got_counts.extend(counts.tolist())
    assert bytes(got) == want
    assert np.array_equal(np.array(got_counts), want_counts)
