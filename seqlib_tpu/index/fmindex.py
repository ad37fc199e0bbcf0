"""FM-index: construction, bwa-format round-trip, and host-side search.

Replaces libbwa's index layer consumed by the reference
(/root/reference/src/BWAIndex.cpp): 2-bit PAC, SA-IS BWT (`is_bwt`),
occ checkpoints (`bwt_bwtupdate_core`, OCC_INTERVAL=128), sampled SA
(`bwt_cal_sa`, interval 32), and the bns annotations.

Rank space: ranks 0..n over the n+1 suffixes of T$ (rank 0 = sentinel),
identical to bwa's bwtint space, so the sampled SA round-trips
byte-exactly with `bwa index` output (verified vs
/root/reference/tests/data/tiny.fa.* in tests/test_index.py).

The checkpointed layout (counts every 128 bases + 16-base uint32 words)
is shared verbatim with the device kernels in seqlib_tpu.ops.fm — one
layout serves host numpy search and TPU gather/popcount search.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.header import BamHeader
from ..native import suffix_array
from .bwa_files import (OCC_INTERVAL, SA_INTERVAL, deinterleave_occ,
                        interleave_occ, read_ann, read_amb, read_bwt,
                        read_pac, read_sa, write_amb, write_ann, write_bwt,
                        write_pac, write_sa)
from .pack import (Annotation, PackedReference, both_strands,
                   pack_sequences)


class FMIndex:
    """In-memory FM-index over forward+revcomp of the reference."""

    def __init__(self):
        self.ref: PackedReference | None = None   # forward codes + anns
        self.sa_full = None       # full SA (construction-time only)
        self.seq_len = 0          # 2 * l_pac
        self.primary = 0          # rank of suffix 0
        self.L2 = np.zeros(5, dtype=np.int64)     # cumulative counts
        self.bwt = None           # uint8 codes, len seq_len (no sentinel)
        self.cp_counts = None     # int64 [n_blocks+1, 4] checkpoints
        self.bwt_words = None     # uint32 [n_blocks, 8] packed data
        self.sa_intv = SA_INTERVAL
        self.sa_samples = None    # uint64 [n_sa], sa_samples[0] invalid

    # ------------------------------------------------------------------
    # construction (parity: ConstructIndex BWAIndex.cpp:83-180)
    # ------------------------------------------------------------------

    @classmethod
    def construct(cls, seqs) -> "FMIndex":
        """Build from [(name, seq)] or UnalignedSequence list."""
        pairs = []
        for s in seqs:
            if hasattr(s, "name"):
                pairs.append((s.name, s.seq))
            else:
                pairs.append((s[0], s[1]))
        idx = cls()
        idx.ref = pack_sequences(pairs)
        text = both_strands(idx.ref.codes)
        idx._build_from_text(text)
        return idx

    def _build_from_text(self, text: np.ndarray) -> None:
        n = text.size
        self.seq_len = n
        # SA-IS over codes shifted to 1..4 with implicit sentinel
        sa_full = suffix_array(text + 1)         # len n+1, sa_full[0] = n
        # primary = rank of suffix 0
        primary = int(np.nonzero(sa_full == 0)[0][0])
        self.primary = primary
        # BWT with the sentinel row (rank == primary, sa == 0) removed:
        # BWT_full[j] = text[sa_full[j] - 1] for sa_full[j] > 0
        mask = sa_full > 0
        self.bwt = text[sa_full[mask] - 1]
        # L2 cumulative counts of text symbols
        counts = np.bincount(text, minlength=4)[:4]
        self.L2[0] = 0
        self.L2[1:] = np.cumsum(counts)
        # occ checkpoints + packed words (device layout == .bwt layout)
        inter = interleave_occ(self.bwt)
        codes, cps = deinterleave_occ(inter, n)
        n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
        self.bwt_words = inter[:n_blocks * 16].reshape(n_blocks, 16)[:, 8:16].copy()
        full_cps = np.empty((n_blocks + 1, 4), dtype=np.int64)
        full_cps[:-1] = cps
        full_cps[-1] = inter[n_blocks * 16:].view(np.uint64).astype(np.int64)
        self.cp_counts = full_cps
        self._interleaved = inter
        # sampled SA in bwa rank space: sa[j] = SA_full[j*intv]
        n_sa = (n + self.sa_intv) // self.sa_intv
        self.sa_samples = sa_full[:(n_sa - 1) * self.sa_intv + 1:
                                  self.sa_intv].astype(np.uint64)
        assert self.sa_samples.size == n_sa
        self.sa_samples[0] = np.uint64(0xFFFFFFFFFFFFFFFF)
        # keep the full SA (construction-time only): the device path
        # turns SA lookup into a single gather instead of an LF walk
        self.sa_full = sa_full

    # ------------------------------------------------------------------
    # I/O (parity: WriteIndex BWAIndex.cpp:360-406, LoadIndex :28-33)
    # ------------------------------------------------------------------

    def write(self, prefix: str) -> None:
        if self.ref is None:
            raise RuntimeError("FMIndex.write: no index constructed")
        write_pac(prefix + ".pac", self.ref.codes)
        write_ann(prefix + ".ann", self.ref)
        write_amb(prefix + ".amb", self.ref)
        write_bwt(prefix + ".bwt", self.primary, self.L2.astype(np.uint64),
                  self._interleaved)
        write_sa(prefix + ".sa", self.primary, self.L2.astype(np.uint64),
                 self.sa_intv, self.seq_len, self.sa_samples)

    @classmethod
    def load(cls, prefix: str) -> "FMIndex":
        idx = cls()
        l_pac, seed, anns = read_ann(prefix + ".ann")
        holes = read_amb(prefix + ".amb")
        codes = read_pac(prefix + ".pac")
        assert codes.size == l_pac, (codes.size, l_pac)
        idx.ref = PackedReference(codes, anns, holes, seed)
        primary, L2, words = read_bwt(prefix + ".bwt")
        idx.primary = primary
        idx.L2 = L2.astype(np.int64)
        idx.seq_len = int(L2[4])
        n = idx.seq_len
        bwt, cps = deinterleave_occ(words, n)
        idx.bwt = bwt
        n_blocks = (n + OCC_INTERVAL - 1) // OCC_INTERVAL
        idx.bwt_words = words[:n_blocks * 16].reshape(n_blocks, 16)[:, 8:].copy()
        full_cps = np.empty((n_blocks + 1, 4), dtype=np.int64)
        full_cps[:-1] = cps.astype(np.int64)
        full_cps[-1] = words[n_blocks * 16:n_blocks * 16 + 8].view(
            np.uint64).astype(np.int64)
        idx.cp_counts = full_cps
        idx._interleaved = words
        sp, intv, seq_len, sa = read_sa(prefix + ".sa")
        assert sp == primary and seq_len == n
        idx.sa_intv = intv
        idx.sa_samples = sa
        return idx

    # ------------------------------------------------------------------
    # annotations / header (parity: HeaderFromIndex BWAIndex.cpp:35-78)
    # ------------------------------------------------------------------

    @property
    def l_pac(self) -> int:
        return self.ref.l_pac if self.ref else self.seq_len // 2

    def num_sequences(self) -> int:
        return len(self.ref.anns)

    def chr_id_to_name(self, i: int) -> str:
        if i < 0 or i >= len(self.ref.anns):
            raise IndexError(f"BWAIndex::ChrIDToName - id {i} out of bounds")
        return self.ref.anns[i].name

    def sam_header_text(self) -> str:
        return "".join(f"@SQ\tSN:{a.name}\tLN:{a.length}\n"
                       for a in self.ref.anns)

    def header_from_index(self) -> BamHeader:
        return BamHeader(self.sam_header_text())

    def pos_to_ref(self, pos: int) -> tuple[int, int]:
        """Text offset (forward strand) -> (reference id, offset in ref).

        Parity: bns_pos2rid-style lookup over annotation offsets.
        """
        offs = np.array([a.offset for a in self.ref.anns], dtype=np.int64)
        rid = int(np.searchsorted(offs, pos, side="right") - 1)
        return rid, pos - int(offs[rid])

    # ------------------------------------------------------------------
    # host-side rank / search (numpy reference for the Pallas kernels)
    # ------------------------------------------------------------------

    def rank(self, c: int, k) -> np.ndarray:
        """# occurrences of c in stored bwt[0..k-1]; k in [0..seq_len],
        vectorized over k."""
        k = np.asarray(k, dtype=np.int64)
        blk = k >> 7
        within = k & 127
        base = self.cp_counts[blk, c]
        # count c among the first `within` bases of block
        word_idx = within >> 4
        bit_within = within & 15
        words = self.bwt_words[np.minimum(blk, self.bwt_words.shape[0] - 1)]
        # unpack all 8 words -> 128 codes (vectorized; host path only)
        shifts = (np.arange(15, -1, -1, dtype=np.uint32) * 2)
        codes = ((words[..., :, None] >> shifts) & 3)  # [..., 8, 16]
        codes = codes.reshape(*k.shape, 128)
        pos = np.arange(128)
        cnt = ((codes == c) & (pos < within[..., None])).sum(axis=-1)
        return base + cnt

    def rank_full(self, c: int, k) -> np.ndarray:
        """rank over BWT_full (with sentinel at row `primary`)."""
        k = np.asarray(k, dtype=np.int64)
        return self.rank(c, k - (k > self.primary))

    def backward_ext(self, l, u, c):
        """One backward-search step: interval [l, u) over ranks
        [0..seq_len+1) -> interval for c+pattern."""
        C = self.L2[c] + 1
        return C + self.rank_full(c, l), C + self.rank_full(c, u)

    def search(self, pattern: np.ndarray) -> tuple[int, int]:
        """Exact-match SA interval [l, u) for nt4-coded pattern."""
        l, u = 0, self.seq_len + 1
        for c in pattern[::-1]:
            if c > 3:
                return 0, 0
            l, u = self.backward_ext(l, u, int(c))
            if l >= u:
                return 0, 0
        return int(l), int(u)

    def sa_lookup(self, r: int) -> int:
        """SA value (text position) for rank r via sampled SA + LF walk."""
        steps = 0
        while True:
            if r % self.sa_intv == 0 and r // self.sa_intv > 0:
                return int(self.sa_samples[r // self.sa_intv]) + steps
            if r == 0:
                return self.seq_len + steps  # sentinel (shouldn't happen)
            if r == self.primary:
                return steps  # SA[primary] = 0
            c = int(self.bwt[r - 1 if r > self.primary else r])
            r = int(self.L2[c]) + 1 + int(self.rank_full(c, r))
            steps += 1

    def locate(self, l: int, u: int, max_hits: int = 512) -> np.ndarray:
        """Text positions for ranks [l, u), capped at max_hits."""
        rs = range(l, min(u, l + max_hits))
        return np.array([self.sa_lookup(r) for r in rs], dtype=np.int64)
