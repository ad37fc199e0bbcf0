"""BFC-style k-mer spectrum error correction.

TPU-native rebuild of the reference's BFC wrapper over fermi-lite's
corrector (/root/reference/src/BFC.cpp, /root/reference/SeqLib/BFC.h):
Train() counts canonical k-mers over the stored reads (hash/sort/
segment-reduce — numpy on host, jax-compatible layout), ErrorCorrect()
estimates k-mer coverage from the count histogram and repairs bases
whose covering k-mers are weak.  API parity with the reference:
AddSequence / SetKmer / Train / ErrorCorrect / GetSequence / kcov.

The vendored bfc sources are absent from the reference snapshot (empty
submodule — SURVEY.md §0.1), so numeric parity is pinned to behavior:
wgsim-style errors on test genomes are corrected (tests/test_assembly).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.seq import NT4_TABLE, encode_nt4, decode_nt4

BFC_EC_MIN_COV_COEF = 0.1


def _pack_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """All k-mers of a [L] nt4 array as uint64 (invalid where N)."""
    L = codes.size
    if L < k:
        return np.empty(0, dtype=np.uint64)
    n = L - k + 1
    out = np.zeros(n, dtype=np.uint64)
    bad = np.zeros(n, dtype=bool)
    for j in range(k):
        c = codes[j:j + n]
        out = (out << np.uint64(2)) | c.astype(np.uint64)
        bad |= c > 3
    return np.where(bad, np.uint64(0xFFFFFFFFFFFFFFFF), out)


def _revcomp_kmers(kmers: np.ndarray, k: int) -> np.ndarray:
    """Reverse-complement packed k-mers."""
    x = ~kmers  # complement each 2-bit base
    out = np.zeros_like(kmers)
    for _ in range(k):
        out = (out << np.uint64(2)) | (x & np.uint64(3))
        x >>= np.uint64(2)
    return out


def canonical_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    f = _pack_kmers(codes, k)
    valid = f != np.uint64(0xFFFFFFFFFFFFFFFF)
    r = _revcomp_kmers(f, k)
    return np.where(valid, np.minimum(f, r),
                    np.uint64(0xFFFFFFFFFFFFFFFF))


class KmerTable:
    """Sorted-array k-mer count table (bfc_ch_t analog): counting is a
    sort + segment-reduce, lookup is searchsorted — the same layout a
    device implementation uses."""

    def __init__(self, kmers: np.ndarray):
        valid = kmers[kmers != np.uint64(0xFFFFFFFFFFFFFFFF)]
        self.keys, self.counts = np.unique(valid, return_counts=True)

    def lookup(self, kmers: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.keys, kmers)
        idx = np.minimum(idx, max(self.keys.size - 1, 0))
        if self.keys.size == 0:
            return np.zeros(kmers.shape, dtype=np.int64)
        hit = self.keys[idx] == kmers
        return np.where(hit, self.counts[idx], 0)

    def hist(self, max_cnt: int = 255) -> np.ndarray:
        h = np.zeros(max_cnt + 1, dtype=np.int64)
        np.add.at(h, np.minimum(self.counts, max_cnt), 1)
        return h


def auto_kmer(total_len: int) -> int:
    """Auto k selection (fml_opt_adjust analog): grows with data size,
    clamped to [17, 27] and forced odd."""
    if total_len <= 0:
        return 17
    k = int(math.log(total_len) / math.log(4) + 8.5)
    k = max(17, min(27, k))
    return k | 1


class BFC:
    """API parity: /root/reference/SeqLib/BFC.h:22-115."""

    def __init__(self):
        self.m_seqs: list[str] = []
        self.m_names: list[str] = []
        self.m_quals: list[str] = []
        self.m_idx = 0
        self.kmer = 0          # 0 = auto (SetKmer parity)
        self.kcov = 0.0
        self.table: KmerTable | None = None
        self.min_cov = 3
        self.flt_uniq = 0

    # -- reads ----------------------------------------------------------

    def add_sequence(self, seq: str, qual: str = "", name: str = "") -> bool:
        if not seq:
            return False
        self.m_seqs.append(seq.upper())
        self.m_quals.append(qual)
        self.m_names.append(name)
        return True

    def allocate_from_reads(self, brv) -> None:
        """From BamRecords (parity: allocate_sequences_from_reads)."""
        for r in brv:
            self.add_sequence(r.seq, r.qualities(), r.qname)

    def num_sequences(self) -> int:
        return len(self.m_seqs)

    def clear_reads(self) -> None:
        self.m_seqs = []
        self.m_names = []
        self.m_quals = []
        self.m_idx = 0

    def get_sequence(self):
        """Iterator-style retrieval, uppercased
        (parity: GetSequence BFC.cpp:141-151); returns (seq, name) or
        None."""
        if self.m_idx >= len(self.m_seqs):
            return None
        s = self.m_seqs[self.m_idx].upper()
        n = self.m_names[self.m_idx]
        self.m_idx += 1
        return s, n

    def reset_get_sequence(self) -> None:
        self.m_idx = 0

    def get_kcov(self) -> float:
        return self.kcov

    def get_kmer(self) -> int:
        return self.kmer

    def set_kmer(self, k: int) -> None:
        self.kmer = k

    # -- training (parity: Train BFC.cpp:208-280) -----------------------

    def train(self) -> None:
        if not self.m_seqs:
            return
        total = sum(len(s) for s in self.m_seqs)
        if self.kmer <= 0:
            self.kmer = auto_kmer(total)
        k = self.kmer
        chunks = [canonical_kmers(encode_nt4(s), k) for s in self.m_seqs
                  if len(s) >= k]
        allk = np.concatenate(chunks) if chunks \
            else np.empty(0, np.uint64)
        self.table = KmerTable(allk)

    # -- correction (parity: ErrorCorrect BFC.cpp:282-362) --------------

    def _estimate_kcov(self) -> float:
        """Mode of the count histogram above the error valley."""
        h = self.table.hist()
        # find first local minimum after 1, then the mode after it
        valley = 1
        for i in range(2, len(h) - 1):
            if h[i] <= h[i - 1] and h[i] <= h[i + 1]:
                valley = i
                break
        if valley + 1 >= len(h):
            return 1.0
        mode = valley + int(np.argmax(h[valley:]))
        return float(mode)

    def error_correct(self) -> None:
        if self.table is None:
            self.train()
        if self.table is None or self.table.keys.size == 0:
            return
        k = self.kmer
        self.kcov = self._estimate_kcov()
        self.min_cov = int(BFC_EC_MIN_COV_COEF * self.kcov + 0.499)
        # bfc's floor is 3 (doubly-supported errors are common
        # at 30x with 0.5% error rate)
        self.min_cov = max(3, min(self.min_cov, 10))
        # two passes: a fix at one end can unlock the greedy scan's
        # repair of the other end on the next sweep
        for _ in range(2):
            changed = False
            for i, s in enumerate(self.m_seqs):
                fixed = self._correct_one(s, k)
                if fixed != s:
                    changed = True
                    self.m_seqs[i] = fixed
            if not changed:
                break

    def _correct_one(self, seq: str, k: int) -> str:
        if len(seq) < k:
            return seq
        codes = encode_nt4(seq).copy()
        n = codes.size - k + 1
        counts = self.table.lookup(canonical_kmers(codes, k))
        solid = counts >= self.min_cov
        if solid.all():
            return seq
        # scan left to right; at each transition solid->weak the base at
        # (weak_start + k - 1) is the error candidate (spectrum edge)
        changed = False
        i = 0
        while i < n:
            if solid[i]:
                i += 1
                continue
            # error candidate position: if previous kmer solid, the new
            # base entering the window; else leftmost base of window
            pos = i + k - 1 if i > 0 and solid[i - 1] else i
            best_b, best_gain = -1, 0
            orig = codes[pos]
            lo = max(0, pos - k + 1)
            hi = min(n, pos + 1)
            cur_solid = int(solid[lo:hi].sum())
            for b in range(4):
                if b == orig:
                    continue
                codes[pos] = b
                sub = canonical_kmers(codes[lo:hi + k - 1], k)
                cnt = self.table.lookup(sub)
                gain = int((cnt >= self.min_cov).sum()) - cur_solid
                if gain > best_gain:
                    best_gain, best_b = gain, b
            if best_b >= 0:
                codes[pos] = best_b
                changed = True
                # recompute window solidity
                sub = canonical_kmers(codes[lo:hi + k - 1], k)
                solid[lo:hi] = self.table.lookup(sub) >= self.min_cov
                i = hi
            else:
                codes[pos] = orig
                i += 1
        return decode_nt4(codes) if changed else seq

    # reference-style aliases
    AddSequence = add_sequence
    Train = train
    ErrorCorrect = error_correct
    GetSequence = get_sequence
    SetKmer = set_kmer
    NumSequences = num_sequences
    ClearReads = clear_reads
    GetKCov = get_kcov
    GetKMer = get_kmer
