"""Regenerate the golden SAM corpora (run intentionally, never in CI):

    python tests/regen_golden.py

Produces, under tests/golden/:
  - sam_100.txt        first 100 sim1_bcr.fq reads vs tiny.fa (legacy pin)
  - sam_wgsim_4k.txt   2000 sim1 + 2000 sim2 wgsim reads vs tiny.fa —
                       covers the reference's own simulated corpus
                       (mismatch/indel reads, BCR-ABL fusion split/clip
                       reads; /root/reference/tests/data/wgsim.sh:23-36)
  - sam_repeat_1k.txt  1000 synthetic reads vs a repeat-heavy genome —
                       deterministic classes: exact fwd/rev, 2-mismatch,
                       4 bp ins/del, 40 bp chimeric soft-clip, duplicated
                       -segment multimappers (XA/mapq-0), tandem-repeat
                       and high-seed-density truncation-stress reads.

Each golden starts with '#'-prefixed provenance lines recording the
generator parameters; comparison tests skip them.  Alignment runs in
fixed-size chunks so one compile serves the whole corpus; outputs are
backend-independent (the device pipeline is bit-exact CPU vs TPU,
tests/test_parallel.py) so regenerating on either host is stable.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from seqlib_tpu.align import BWAAligner            # noqa: E402
from seqlib_tpu.index import FMIndex               # noqa: E402
from seqlib_tpu.io import FastqReader              # noqa: E402

DATA = "/root/reference/tests/data"
GOLDEN = os.path.join(HERE, "golden")
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
CHUNK = 1000


def _align_corpus(aligner, hdr, reads):
    out = []
    for i in range(0, len(reads), CHUNK):
        chunk = reads[i:i + CHUNK]
        # pad the tail chunk to CHUNK so every dispatch shares one
        # compiled shape; padded outputs are dropped.  Repeat the chunk
        # as many times as needed (a chunk shorter than CHUNK/2 can't
        # reach CHUNK with a single extension — ADVICE r3).
        reps = (CHUNK + len(chunk) - 1) // len(chunk)
        padded = (chunk * reps)[:CHUNK]
        res = aligner.align_batch([s for _, s in padded],
                                  [n for n, _ in padded])
        for recs in res[:len(chunk)]:
            for r in recs:
                out.append(r.to_sam(hdr))
    return out


def _write(path, header_lines, sam_lines):
    with open(path, "w") as f:
        for h in header_lines:
            f.write("# " + h + "\n")
        for s in sam_lines:
            f.write(s + "\n")
    print(f"wrote {path}: {len(sam_lines)} records")


def _rc(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def make_repeat_genome():
    """Repeat-heavy synthetic genome, fully deterministic (seed 7).

    Layout (single contig 'rep1', 131 kb):
      [0, 120k)        random background
      20k, 60k         two EXACT copies of a 3 kb segment  -> mapq-0 class
      90k              third copy at 1% divergence          -> XA class
      [120k, 123k)     tandem repeat: 50 x 60 bp unit       -> seed-dense
      [123k, 131k)     random tail
    """
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, 131_000).astype(np.uint8)
    seg = rng.integers(0, 4, 3000).astype(np.uint8)
    g[20_000:23_000] = seg
    g[60_000:63_000] = seg
    div = seg.copy()
    muts = rng.choice(3000, 30, replace=False)
    div[muts] = (div[muts] + rng.integers(1, 4, 30)) % 4
    g[90_000:93_000] = div
    unit = rng.integers(0, 4, 60).astype(np.uint8)
    g[120_000:123_000] = np.tile(unit, 50)
    return BASES[g].tobytes().decode()


def make_repeat_reads(genome: str):
    """1000 deterministic 150 bp reads in 10 classes of 100."""
    rng = np.random.default_rng(11)
    L = 150
    reads = []

    def sub(p):
        return genome[p:p + L]

    def mutate(s, n):
        b = np.frombuffer(s.encode(), dtype=np.uint8).copy()
        pos = rng.choice(L, n, replace=False)
        for p in pos:
            cur = b"ACGT".index(b[p])
            b[p] = BASES[(cur + int(rng.integers(1, 4))) % 4]
        return b.tobytes().decode()

    bg = lambda: int(rng.integers(0, 119_000 - L))     # noqa: E731
    for i in range(100):                                # exact forward
        reads.append((f"rep_exact_{i}", sub(bg())))
    for i in range(100):                                # exact revcomp
        reads.append((f"rep_rc_{i}", _rc(sub(bg()))))
    for i in range(100):                                # 2 mismatches
        reads.append((f"rep_mm2_{i}", mutate(sub(bg()), 2)))
    for i in range(100):                                # 4 bp deletion
        p = bg()
        s = genome[p:p + 70] + genome[p + 74:p + 74 + (L - 70)]
        reads.append((f"rep_del4_{i}", s))
    for i in range(100):                                # 4 bp insertion
        p = bg()
        ins = BASES[rng.integers(0, 4, 4)].tobytes().decode()
        s = genome[p:p + 70] + ins + genome[p + 70:p + 70 + (L - 74)]
        reads.append((f"rep_ins4_{i}", s))
    for i in range(100):                                # 40 bp chimeric clip
        flank = BASES[rng.integers(0, 4, 40)].tobytes().decode()
        reads.append((f"rep_clip_{i}", flank + sub(bg())[:110]))
    for i in range(100):                                # exact-dup multimapper
        p = 20_000 + int(rng.integers(0, 3000 - L))
        reads.append((f"rep_dup_{i}", sub(p)))
    for i in range(100):                                # divergent-copy (XA)
        p = 90_000 + int(rng.integers(0, 3000 - L))
        reads.append((f"rep_xa_{i}", sub(p)))
    for i in range(100):                                # tandem repeat
        p = 120_000 + int(rng.integers(0, 3000 - L))
        reads.append((f"rep_tandem_{i}", sub(p)))
    for i in range(100):                                # truncation stress:
        # concatenate three tandem-unit windows -> very dense seeds
        p = 120_000 + int(rng.integers(0, 2800))
        reads.append((f"rep_stress_{i}", (genome[p:p + 50]
                                          + genome[p + 60:p + 110]
                                          + genome[p + 120:p + 170])))
    return reads


def main():
    os.makedirs(GOLDEN, exist_ok=True)

    # --- wgsim corpora vs tiny.fa --------------------------------------
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    idx = FMIndex.construct(seqs)
    aln = BWAAligner(idx)
    hdr = idx.header_from_index()

    def load(fq, n):
        out = []
        for rec in FastqReader(f"{DATA}/{fq}"):
            out.append((rec.name, rec.seq))
            if len(out) >= n:
                break
        return out

    r1 = load("sim1_bcr.fq", 2000)
    r2 = load("sim2_bcr.fq", 2000)
    sam = _align_corpus(aln, hdr, r1 + r2)
    _write(os.path.join(GOLDEN, "sam_wgsim_4k.txt"), [
        "golden: 2000 sim1_bcr.fq + 2000 sim2_bcr.fq reads vs tiny.fa",
        "generator: tests/regen_golden.py (chunk=1000, default options)",
        "source reads: /root/reference/tests/data (wgsim.sh pipeline)",
    ], sam)

    # legacy 100-read pin (kept byte-compatible: no header lines)
    sam100 = _align_corpus(aln, hdr, r1[:100])
    # note: sam_100.txt historically has no provenance header
    with open(os.path.join(GOLDEN, "sam_100.txt"), "w") as f:
        for s in sam100:
            f.write(s + "\n")
    print(f"wrote sam_100.txt: {len(sam100)} records")

    # --- repeat-heavy synthetic corpus ---------------------------------
    genome = make_repeat_genome()
    ridx = FMIndex.construct([("rep1", genome)])
    raln = BWAAligner(ridx)
    rhdr = ridx.header_from_index()
    reads = make_repeat_reads(genome)
    rsam = _align_corpus(raln, rhdr, reads)
    _write(os.path.join(GOLDEN, "sam_repeat_1k.txt"), [
        "golden: 1000 deterministic reads vs repeat-heavy synthetic",
        "genome: make_repeat_genome() seed 7 (exact dup pair, 1%-divergent"
        " copy, 50x60bp tandem); reads: make_repeat_reads() seed 11,"
        " 10 classes x 100",
        "generator: tests/regen_golden.py (chunk=1000, default options)",
    ], rsam)


if __name__ == "__main__":
    main()
