"""seqtools-equivalent CLI: bfc / fml subcommands.

Parity target: /root/reference/src/seqtools/seqtools.cpp — ``bfc``
streams reads (BAM/SAM or FASTA/FASTQ), BFC-corrects them, and either
emits FASTA or realigns against a reference with the BWA-MEM engine
into SAM/BAM; ``fml`` additionally assembles corrected reads into
contigs before realignment.  Flags -v/-f/-b/-C/-F/-G/-T mirror
seqtools.cpp:69-80.  Adds an ``align`` subcommand (plain bwa-mem-style
mapping) and ``index`` (build/store the FM-index), which the reference
leaves to external bwa.
"""

from __future__ import annotations

import argparse
import sys

from .align import BWAAligner
from .align.pairing import mark_supplementary
from .assembly import BFC, FermiAssembler
from .core.unaligned import UnalignedSequence
from .index import FMIndex
from .io import BAM, CRAM, SAM, BamReader, BamWriter, FastqReader


def _read_input(args) -> list[UnalignedSequence]:
    seqs: list[UnalignedSequence] = []
    if args.infasta:
        for rec in FastqReader(args.infasta):
            seqs.append(rec)
    else:
        path = args.input or "-"
        if path != "-" and path.endswith(".bam"):
            # native columnar fast path for BAM inputs
            from .io.fast_bam import FastBamReader
            from . import native
            if native.get_lib() is not None:
                try:
                    for rec in FastBamReader(path):
                        seqs.append(UnalignedSequence(
                            rec.qname, rec.seq, rec.qualities()))
                    return seqs
                except (ValueError, RuntimeError):
                    seqs = []
        rd = BamReader()
        if not rd.open(path):
            sys.exit(f"cannot open input {args.input}")
        for rec in iter(rd.next, None):
            seqs.append(UnalignedSequence(rec.qname, rec.seq,
                                          rec.qualities()))
    return seqs


def _emit(seqs, names, args, tag: str, quals=None) -> None:
    """Correctable output: FASTA, or realign + SAM/BAM."""
    if args.fasta or not args.reference:
        out = sys.stdout
        for name, s in zip(names, seqs):
            out.write(f">{name}\n{s}\n")
        return
    idx, aln = _open_aligner(args.reference)
    hdr = idx.header_from_index()
    fmt = BAM if args.bam else (CRAM if args.cram else SAM)
    w = BamWriter(fmt)
    w.open(args.output or "-")
    w.set_header(hdr)
    w.write_header()
    B = 512
    n = 0
    for i in range(0, len(seqs), B):
        chunk = seqs[i:i + B]
        cnames = names[i:i + B]
        results = aln.align_batch(chunk, cnames, hardclip=False,
                                  keep_sec_frac=0.9, max_secondary=10)
        for k, recs in enumerate(results):
            mark_supplementary(recs)
            for r in recs:
                # restore input qualities (parity: seqtools.cpp:312-324
                # SetQualities after AlignSequence)
                if quals is not None and quals[i + k] \
                        and len(quals[i + k]) == len(r.seq):
                    r.set_qualities(quals[i + k])
                w.write_record(r)
                n += 1
        if args.verbose:
            print(f"...aligned {i + len(chunk)} sequences",
                  file=sys.stderr)
    w.close()
    if args.verbose:
        print(f"{tag}: wrote {n} records", file=sys.stderr)


def _has_index(prefix: str) -> bool:
    import os
    return all(os.path.exists(prefix + e)
               for e in (".bwt", ".pac", ".sa", ".ann", ".amb"))


def _has_sharded_index(prefix: str) -> bool:
    import os
    return os.path.exists(prefix + ".shards")


def _open_aligner(reference: str):
    """(index, aligner) for a reference path; references past the
    single-device int32 bound automatically build (or load) a sharded
    index (index/sharded.py) with whole-reference alignment
    semantics."""
    from .align import ShardedBWAAligner
    from .index import ShardedFMIndex
    from .index.sharded import DEFAULT_MAX_SHARD_BP
    if _has_sharded_index(reference):
        sidx = ShardedFMIndex.load(reference)
        return sidx, ShardedBWAAligner(sidx)
    if _has_index(reference):
        from .index.bwa_files import read_ann
        l_pac, _, _ = read_ann(reference + ".ann")
        if l_pac > DEFAULT_MAX_SHARD_BP:
            # the monolithic on-disk index exceeds the device int32
            # bound; a silent load would overflow DeviceFMIndex
            raise ValueError(
                f"index {reference} spans {l_pac} bp > device bound "
                f"{DEFAULT_MAX_SHARD_BP}; rebuild it sharded with "
                f"'seqtools index' (writes a .shards manifest)")
        idx = FMIndex.load(reference)
        return idx, BWAAligner(idx)
    seqs = _load_fasta(reference)
    total = sum(len(s[1]) if not hasattr(s, "seq") else len(s.seq)
                for s in seqs)
    if total > DEFAULT_MAX_SHARD_BP:
        idx = ShardedFMIndex.construct(seqs)
        return idx, ShardedBWAAligner(idx)
    idx = FMIndex.construct(seqs)
    return idx, BWAAligner(idx)


def _load_fasta(path: str):
    return [(r.name, r.seq) for r in FastqReader(path)]


def run_bfc(args) -> None:
    """(parity: runbfc seqtools.cpp:214-326)"""
    seqs = _read_input(args)
    b = BFC()
    for u in seqs:
        b.add_sequence(u.seq, u.qual, u.name)
    if args.verbose:
        print(f"...loaded {b.num_sequences()} sequences", file=sys.stderr)
    b.train()
    b.error_correct()
    if args.verbose:
        print(f"...corrected (k={b.get_kmer()}, kcov={b.get_kcov():.1f})",
              file=sys.stderr)
    corrected, names = [], []
    b.reset_get_sequence()
    while True:
        nxt = b.get_sequence()
        if nxt is None:
            break
        corrected.append(nxt[0])
        names.append(nxt[1])
    _emit(corrected, names, args, "bfc", quals=b.m_quals)


def run_fml(args) -> None:
    """(parity: runfml seqtools.cpp:106-212)"""
    seqs = _read_input(args)
    f = FermiAssembler()
    f.add_reads(seqs)
    if args.verbose:
        print(f"...loaded {f.num_sequences()} sequences", file=sys.stderr)
    f.correct_reads()
    f.perform_assembly()
    contigs = f.get_contigs()
    if args.verbose:
        print(f"...assembled {len(contigs)} contigs", file=sys.stderr)
    names = [f"contig_{i}" for i in range(len(contigs))]
    _emit(contigs, names, args, "fml")


def run_align(args) -> None:
    """TPU-native extra: straight bwa-mem-style alignment (optionally
    paired with -2)."""
    if getattr(args, "infasta2", None):
        _run_align_paired(args)
        return
    seqs = _read_input(args)
    _emit([u.seq for u in seqs], [u.name for u in seqs], args, "align")


def _run_align_paired(args) -> None:
    """Full paired-end pipeline: per-batch insert-size inference +
    mem_matesw-style mate rescue + proper-pair bounds
    (align.pairing.align_pairs — the behaviour the reference's own
    fixtures get from paired `bwa mem`, tests/data/wgsim.sh:32-36)."""
    from .align.pairing import align_pairs
    r1 = list(FastqReader(args.infasta))
    r2 = list(FastqReader(args.infasta2))
    if len(r1) != len(r2):
        sys.exit("paired inputs have different read counts")
    idx, aln = _open_aligner(args.reference)
    hdr = idx.header_from_index()
    fmt = BAM if args.bam else (CRAM if args.cram else SAM)
    w = BamWriter(fmt)
    w.open(args.output or "-")
    w.set_header(hdr)
    w.write_header()
    B = 512
    n = 0
    stats = None
    rescue_capable = hasattr(aln, "text")   # sharded: flags only
    for i in range(0, len(r1), B):
        out1, out2, stats = align_pairs(
            aln, [u.seq for u in r1[i:i + B]],
            [u.seq for u in r2[i:i + B]],
            [u.name for u in r1[i:i + B]],
            stats=stats, rescue=rescue_capable)
        for recs1, recs2 in zip(out1, out2):
            for r in recs1 + recs2:
                w.write_record(r)
                n += 1
    w.close()
    if args.verbose:
        print(f"align(paired): wrote {n} records", file=sys.stderr)


def run_index(args) -> None:
    """TPU-native extra: build + write a bwa-format index (sharded
    automatically when the reference exceeds the device int32 bound)."""
    from .index import ShardedFMIndex
    from .index.sharded import DEFAULT_MAX_SHARD_BP
    seqs = _load_fasta(args.fasta_file)
    total = sum(len(s[1]) for s in seqs)
    if total > DEFAULT_MAX_SHARD_BP:
        sidx = ShardedFMIndex.construct(seqs)
        sidx.write(args.fasta_file)
        print(f"indexed {args.fasta_file} ({sidx.num_sequences()} "
              f"sequences, {total} bp, {sidx.n_shards} shards)",
              file=sys.stderr)
        return
    idx = FMIndex.construct(seqs)
    idx.write(args.fasta_file)
    print(f"indexed {args.fasta_file} "
          f"({idx.num_sequences()} sequences, {idx.l_pac} bp)",
          file=sys.stderr)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="seqtools",
        description="TPU-native seqtools: error correction, assembly, "
                    "alignment")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("-v", "--verbose", action="store_true")
        sp.add_argument("-f", "--fasta", action="store_true",
                        help="output FASTA (no realignment)")
        sp.add_argument("-b", "--bam", action="store_true",
                        help="output BAM (not SAM)")
        sp.add_argument("-C", "--cram", action="store_true",
                        help="output CRAM (not SAM)")
        sp.add_argument("-F", "--infasta",
                        help="input FASTA/FASTQ instead of BAM/SAM")
        sp.add_argument("-2", "--infasta2", dest="infasta2",
                        help="read-2 FASTQ for paired-end alignment")
        sp.add_argument("-G", "--reference",
                        help="reference genome (fasta or index prefix)")
        sp.add_argument("-T", "--target",
                        help="input target sequence")
        sp.add_argument("-o", "--output", default="-")
        sp.add_argument("input", nargs="?", default="-")

    for name, fn in (("bfc", run_bfc), ("fml", run_fml),
                     ("align", run_align)):
        sp = sub.add_parser(name)
        common(sp)
        sp.set_defaults(func=fn)
    sp = sub.add_parser("index")
    sp.add_argument("fasta_file")
    sp.set_defaults(func=run_index)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        args.func(args)
    except (OSError, ValueError, RuntimeError) as e:
        print(f"seqtools: error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
