"""wgsim-style paired-read simulator.

Replaces the wgsim invocation that generates the reference's test data
(/root/reference/tests/data/wgsim.sh:23-28): paired 2x`read_len` reads
with substitution errors at `error_rate`, insert size Normal(`dist`,
`stdev`).  Read names encode truth like wgsim:
``<contig>_<beg1>_<end2>_..._<serial>``.
"""

from __future__ import annotations

import numpy as np

from .core.seq import revcomp
from .core.unaligned import UnalignedSequence


def simulate_pairs(seqs: list[tuple[str, str]], n_pairs: int,
                   read_len: int = 150, dist: int = 300, stdev: int = 30,
                   error_rate: float = 0.002, seed: int = 7):
    """Returns (reads1, reads2) lists of UnalignedSequence."""
    rng = np.random.default_rng(seed)
    lengths = np.array([len(s) for _, s in seqs], dtype=np.float64)
    probs = lengths / lengths.sum()
    reads1, reads2 = [], []
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    qual = "2" * read_len  # wgsim default qualities ('2' = phred 17)

    def mutate(s: str) -> str:
        arr = np.frombuffer(s.encode(), dtype=np.uint8).copy()
        errs = np.flatnonzero(rng.random(arr.size) < error_rate)
        for e in errs:
            cur = arr[e]
            choices = bases[bases != cur]
            arr[e] = rng.choice(choices)
        return arr.tobytes().decode()

    made = 0
    while made < n_pairs:
        ci = int(rng.choice(len(seqs), p=probs))
        name, seq = seqs[ci]
        isize = int(rng.normal(dist, stdev))
        if isize < read_len + 10:
            isize = read_len + 10
        if len(seq) <= isize:
            continue
        beg = int(rng.integers(0, len(seq) - isize))
        frag = seq[beg:beg + isize]
        if "N" in frag:
            continue
        r1 = frag[:read_len]
        r2 = revcomp(frag[-read_len:])
        # wgsim flips which end is "read1" at random
        if rng.random() < 0.5:
            r1, r2 = revcomp(frag[-read_len:]), frag[:read_len]
            r1 = r1
        nm = f"{name}_{beg + 1}_{beg + isize}_0:0:0_0:0:0_{made:x}"
        reads1.append(UnalignedSequence(nm + "/1", mutate(r1), qual))
        reads2.append(UnalignedSequence(nm + "/2", mutate(r2), qual))
        made += 1
    return reads1, reads2
