"""BFC error correction + FermiAssembler tests.

Oracles: wgsim-style errors are corrected back to truth; assembly of
corrected reads reconstructs the source region as exact-substring
contigs (BASELINE.md config 3 analog — the fermi-lite submodule is
empty in the reference snapshot, so truth is the simulated region).
"""

import io

import numpy as np
import pytest

from seqlib_tpu.assembly import BFC, FermiAssembler, auto_kmer
from seqlib_tpu.assembly.bfc import KmerTable, canonical_kmers
from seqlib_tpu.core.seq import encode_nt4, revcomp
from seqlib_tpu.core.unaligned import UnalignedSequence
from seqlib_tpu.io import FastqReader
from seqlib_tpu.sim import simulate_pairs


@pytest.fixture(scope="module")
def region():
    fa = FastqReader("/root/reference/tests/data/tiny.fa")
    seqs = [(s.name, s.seq) for s in fa]
    return seqs[0][1][10000:14000]


@pytest.fixture(scope="module")
def sim_reads(region):
    r1, r2 = simulate_pairs([("r", region)], 550, read_len=150,
                            error_rate=0.005, seed=3)
    return [u.seq for u in r1] + [u.seq for u in r2]


# -- k-mer machinery --------------------------------------------------------

def test_canonical_kmers():
    codes = encode_nt4("ACGTACGTACGTACGTACGTA")
    k = canonical_kmers(codes, 17)
    assert k.size == 5
    # canonical: k-mer equals canonical of its revcomp
    rc = encode_nt4(revcomp("ACGTACGTACGTACGTACGTA"))
    k2 = canonical_kmers(rc, 17)
    assert set(k.tolist()) == set(k2.tolist())


def test_kmer_table_counts():
    codes = encode_nt4("AAAAAAAAAAAAAAAAAAAAA")  # 21 A's -> 5 identical 17-mers
    t = KmerTable(canonical_kmers(codes, 17))
    assert t.keys.size == 1
    assert t.counts[0] == 5
    assert t.lookup(canonical_kmers(codes, 17)[:1])[0] == 5
    absent = canonical_kmers(encode_nt4("ACGT" * 5 + "A"), 17)[:1]
    assert t.lookup(absent)[0] == 0


def test_auto_kmer_monotone():
    assert auto_kmer(10_000) == 17
    assert auto_kmer(10**9) >= auto_kmer(10**6)
    assert auto_kmer(10**12) <= 27
    assert auto_kmer(10**8) % 2 == 1


# -- BFC --------------------------------------------------------------------

def test_bfc_api_surface():
    b = BFC()
    assert b.add_sequence("ACGTACGT", "IIIIIIII", "r1")
    assert not b.add_sequence("")
    assert b.num_sequences() == 1
    s, n = b.get_sequence()
    assert s == "ACGTACGT" and n == "r1"
    assert b.get_sequence() is None
    b.reset_get_sequence()
    assert b.get_sequence() is not None
    b.clear_reads()
    assert b.num_sequences() == 0
    b.set_kmer(21)
    assert b.get_kmer() == 21


def test_bfc_corrects_errors(region, sim_reads):
    b = BFC()
    for s in sim_reads:
        b.add_sequence(s)
    b.train()
    assert b.get_kmer() >= 17
    before = sum(1 for s in sim_reads
                 if s in region or revcomp(s) in region)
    b.error_correct()
    assert b.get_kcov() > 10
    after = sum(1 for s in b.m_seqs
                if s in region or revcomp(s) in region)
    # most imperfect reads get fully repaired
    assert after > before + 0.5 * (len(sim_reads) - before)
    assert after >= 0.9 * len(sim_reads)


# -- FermiAssembler ---------------------------------------------------------

def test_fermi_api_and_options():
    f = FermiAssembler()
    assert f.get_min_overlap() == 33
    f.set_min_overlap(50)
    assert f.get_min_overlap() == 50
    f.set_drop_overlap_ratio(0.5)
    f.set_kmer_min_threshold(3)
    f.set_kmer_max_threshold(10)
    f.set_aggressive_trim()
    f.add_read(UnalignedSequence("a", "ACGT" * 40))
    assert f.num_sequences() == 1
    with pytest.raises(ValueError):
        f.add_read(UnalignedSequence("bad", ""))
    f.clear_reads()
    assert f.num_sequences() == 0


def test_fermi_assembles_region(region, sim_reads):
    b = BFC()
    for s in sim_reads:
        b.add_sequence(s)
    b.train()
    b.error_correct()
    f = FermiAssembler()
    f.add_reads([UnalignedSequence(f"r{i}", s)
                 for i, s in enumerate(b.m_seqs)])
    f.perform_assembly()
    ctgs = sorted(f.get_contigs(), key=len, reverse=True)
    assert ctgs
    big = ctgs[0]
    assert len(big) >= 0.5 * len(region)
    assert big in region or revcomp(big) in region
    # deterministic
    f2 = FermiAssembler()
    f2.add_reads([UnalignedSequence(f"r{i}", s)
                  for i, s in enumerate(b.m_seqs)])
    f2.perform_assembly()
    assert f2.get_contigs() == f.get_contigs()


def test_fermi_correct_reads_inplace(region, sim_reads):
    f = FermiAssembler()
    f.add_reads([UnalignedSequence(f"r{i}", s)
                 for i, s in enumerate(sim_reads[:400])])
    f.correct_reads()
    seqs = [u.seq for u in f.get_sequences()]
    perf = sum(1 for s in seqs if s in region or revcomp(s) in region)
    assert perf >= 0.85 * len(seqs)


def test_fermi_direct_assemble(region, sim_reads):
    # perfect reads, no correction needed
    r1, r2 = simulate_pairs([("r", region)], 300, error_rate=0.0, seed=9)
    f = FermiAssembler()
    f.add_reads([UnalignedSequence(u.name, u.seq) for u in r1 + r2])
    f.direct_assemble(kcov=20.0)
    ctgs = sorted(f.get_contigs(), key=len, reverse=True)
    assert ctgs and (ctgs[0] in region or revcomp(ctgs[0]) in region)


def test_gfa_export(region):
    r1, r2 = simulate_pairs([("r", region)], 300, error_rate=0.0, seed=1)
    f = FermiAssembler()
    f.add_reads([UnalignedSequence(u.name, u.seq) for u in r1 + r2])
    f.perform_assembly()
    buf = io.StringIO()
    f.write_gfa(buf)
    gfa = buf.getvalue()
    assert gfa.startswith("H\tVN:Z:1.0")
    s_lines = [l for l in gfa.splitlines() if l.startswith("S\t")]
    assert len(s_lines) == len(f.get_contigs())
    for l in s_lines:
        parts = l.split("\t")
        # reference WriteGFA format: S <id> <seq> LN:i: RC:i: PD:Z:
        assert parts[2] == f.get_contigs()[int(parts[1])]
        assert parts[3] == f"LN:i:{len(parts[2])}"
        assert parts[4].startswith("RC:i:")
        assert parts[5].startswith("PD:Z:")


def test_config3_scale_one_contig():
    """BASELINE config 3 analog (scaled to CI): BFC-correct + assemble
    simulated reads over a 50 kb region; the device k-mer pipeline +
    sort-join string graph must reconstruct the region as essentially
    ONE exact-substring contig."""
    from seqlib_tpu.io import FastqReader
    fa = FastqReader("/root/reference/tests/data/tiny.fa")
    tiny = [(s.name, s.seq) for s in fa]
    region = (tiny[0][1] + tiny[1][1])[:50000]
    r1, r2 = simulate_pairs([("r", region)], 5000, read_len=150,
                            error_rate=0.005, seed=7)
    reads = [u.seq for u in r1] + [u.seq for u in r2]
    b = BFC()
    for s in reads:
        b.add_sequence(s)
    b.train()
    b.error_correct()
    f = FermiAssembler()
    f.add_reads([UnalignedSequence(f"r{i}", s)
                 for i, s in enumerate(b.m_seqs)])
    f.perform_assembly()
    ctgs = sorted(f.get_contigs(), key=len, reverse=True)
    # the 50 kb region must condense to exactly ONE exact-substring
    # contig covering >=99% of it (round-2 bar; FermiAssembler.cpp:24-39)
    assert len(ctgs) == 1
    assert len(ctgs[0]) >= 0.99 * len(region)
    assert ctgs[0] in region or revcomp(ctgs[0]) in region
