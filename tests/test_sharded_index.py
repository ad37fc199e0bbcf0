"""Sharded FM-index parity: sharded aligner output == single-index.

The sharded path exists for references past the device int32 bound
(BASELINE.md config 4); on a small genome it must reproduce the
single-index aligner's records exactly — same merged-dedup, primary
marking, MAPQ, CIGARs, tags (reference semantics of one bwaidx_t,
/root/reference/src/BWAAligner.cpp:104-149).
"""

import itertools

import jax
import pytest

from seqlib_tpu.align import BWAAligner, ShardedBWAAligner
from seqlib_tpu.index import FMIndex, ShardedFMIndex
from seqlib_tpu.io import FastqReader

DATA = "/root/reference/tests/data"


@pytest.fixture(scope="module")
def tiny_seqs():
    return [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]


@pytest.fixture(scope="module")
def reads():
    return list(itertools.islice(FastqReader(f"{DATA}/sim1_bcr.fq"), 200))


def _records(aligner, reads):
    out = aligner.align_batch([r.seq for r in reads],
                              [r.name for r in reads])
    flat = []
    for recs in out:
        for r in recs:
            flat.append((r.qname, r.flag, r.tid, r.pos, r.mapq,
                         str(r.cigar), r.seq,
                         r.get_int_tag("NM"), r.get_int_tag("AS")))
    return flat


def test_shard_packing(tiny_seqs):
    sh = ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000)
    assert sh.n_shards >= 2
    assert sh.num_sequences() == len(tiny_seqs)
    # global contig ids follow input order
    for i, (name, _) in enumerate(tiny_seqs):
        assert sh.chr_id_to_name(i) == name
    single = FMIndex.construct(tiny_seqs)
    assert sh.sam_header_text() == single.sam_header_text()


def test_sharded_vs_single_records(tiny_seqs, reads):
    single = BWAAligner(FMIndex.construct(tiny_seqs))
    sharded = ShardedBWAAligner(
        ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000))
    a = _records(single, reads)
    b = _records(sharded, reads)
    # EXACT parity, including every secondary (the round-2 2% slack
    # existed for dedup-order divergence; the round-3 shared hash-rank
    # walk removed it — keep this strict so any regression is loud)
    assert sorted(a) == sorted(b)


def test_sharded_device_spread(tiny_seqs, reads):
    """One shard per device (TP analog) gives identical output."""
    devs = jax.devices()
    sharded = ShardedBWAAligner(
        ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000),
        devices=devs)
    seq = ShardedBWAAligner(
        ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000))
    assert _records(sharded, reads[:64]) == _records(seq, reads[:64])


def test_sharded_stream(tiny_seqs, reads):
    sharded = ShardedBWAAligner(
        ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000))
    got = list(sharded.align_stream(iter(reads), batch_size=64))
    assert len(got) == len(reads)
    batch = sharded.align_batch([r.seq for r in reads],
                                [r.name for r in reads])
    for (rd, recs), recs2 in zip(got, batch):
        assert [str(x.cigar) for x in recs] == [str(x.cigar) for x in recs2]


def test_sharded_write_load(tiny_seqs, tmp_path):
    sh = ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000)
    sh.write(str(tmp_path / "idx"))
    re = ShardedFMIndex.load(str(tmp_path / "idx"), sh.n_shards)
    assert re.num_sequences() == sh.num_sequences()
    assert re.sam_header_text() == sh.sam_header_text()


def test_sharded_manifest_load(tiny_seqs, tmp_path):
    """write() records a .shards manifest; load() is self-describing."""
    sh = ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000)
    sh.write(str(tmp_path / "idx"))
    assert (tmp_path / "idx.shards").exists()
    re = ShardedFMIndex.load(str(tmp_path / "idx"))   # no n_shards arg
    assert re.n_shards == sh.n_shards
    assert re.sam_header_text() == sh.sam_header_text()


def test_cli_detects_sharded_index(tiny_seqs, tmp_path):
    from seqlib_tpu.cli import _open_aligner
    from seqlib_tpu.align import ShardedBWAAligner as SBA
    sh = ShardedFMIndex.construct(tiny_seqs, max_shard_bp=120_000)
    prefix = str(tmp_path / "ref.fa")
    sh.write(prefix)
    idx, aln = _open_aligner(prefix)
    assert isinstance(aln, SBA)
    assert idx.n_shards == sh.n_shards


def test_cli_rejects_oversized_monolithic_index(tmp_path, monkeypatch):
    """A prebuilt single index past the device bound must not be loaded
    silently (it would overflow DeviceFMIndex int32 ranks)."""
    import seqlib_tpu.cli as cli
    prefix = str(tmp_path / "big.fa")
    for e in (".bwt", ".pac", ".sa", ".amb"):
        (tmp_path / ("big.fa" + e)).write_bytes(b"")
    (tmp_path / "big.fa.ann").write_text("2000000001 1 11\n0 chrX (null)\n"
                                         "0 2000000001 0\n")
    with pytest.raises(ValueError, match="device bound"):
        cli._open_aligner(prefix)
