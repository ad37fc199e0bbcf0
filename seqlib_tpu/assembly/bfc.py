"""BFC-style k-mer spectrum error correction — device pipeline.

TPU-native rebuild of the reference's BFC wrapper over fermi-lite's
corrector (/root/reference/src/BFC.cpp, /root/reference/SeqLib/BFC.h).
Train() counts canonical k-mers on DEVICE (pack -> sort -> segment
reduce, ops/kmer.py — fml_count's role, BFC.cpp:208-280);
ErrorCorrect() estimates k-mer coverage from the count histogram with
the reference's exact formula (kcov = tot_k/sum_k over counts >=
min_cnt; min_cov = clamp(0.1*kcov+.499, min_cnt, max_cnt),
BFC.cpp:282-362) and repairs reads with a DEVICE lockstep
spectrum-walk (ops.kmer.correct_reads_device — kmer_correct's role).
API parity: AddSequence / SetKmer / Train / ErrorCorrect /
GetSequence / kcov.

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
        self.min_cnt = 4       # fml_opt_init defaults
        self.max_cnt = 8
        self._dev = None       # (keys_hi, keys_lo, counts) device arrays

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

    def _encode_batch(self):
        """Reads as one padded [B, L] nt4 matrix + lengths (device
        batch layout shared with the aligner).  B is bucketed
        (powers of two, then multiples of 4096) so the jitted kernels
        compile once per bucket, not once per read count."""
        L = max((len(s) for s in self.m_seqs), default=0)
        L = max(((L + 31) // 32) * 32, 32)
        B = len(self.m_seqs)
        Bp = 64
        while Bp < B and Bp < 4096:
            Bp *= 2
        if B > Bp:
            Bp = (B + 4095) // 4096 * 4096
        reads = np.full((Bp, L), 4, np.uint8)
        lens = np.zeros(Bp, np.int64)
        for i, s in enumerate(self.m_seqs):
            e = encode_nt4(s)
            reads[i, :e.size] = e
            lens[i] = e.size
        return reads, lens

    def train(self) -> None:
        if not self.m_seqs:
            return
        import jax
        import jax.numpy as jnp
        from ..ops.kmer import canonical_kmers_device, count_kmers_device
        total = sum(len(s) for s in self.m_seqs)
        if self.kmer <= 0:
            self.kmer = auto_kmer(total)
        k = self.kmer
        reads, lens = self._encode_batch()
        hi, lo, valid = canonical_kmers_device(
            jnp.asarray(reads), jnp.asarray(lens), k)
        kh, kl, cnt, n_uniq = count_kmers_device(hi, lo, valid)
        self._dev = (kh, kl, cnt)
        # host mirror for the KmerTable API (fermi filters, tests)
        n = int(n_uniq)
        h_np = np.asarray(kh[:n]).astype(np.uint32).astype(np.uint64)
        l_np = np.asarray(kl[:n]).astype(np.uint32).astype(np.uint64)
        t = KmerTable.__new__(KmerTable)
        t.keys = (h_np << np.uint64(32)) | l_np
        t.counts = np.asarray(cnt[:n]).astype(np.int64)
        self.table = t

    # -- correction (parity: ErrorCorrect BFC.cpp:282-362) --------------

    def error_correct(self) -> None:
        if self.table is None:
            self.train()
        if self.table is None or self.table.keys.size == 0:
            return
        import jax.numpy as jnp
        from ..ops.kmer import correct_reads_device
        k = self.kmer
        # exact reference coverage estimate (BFC.cpp:326-346):
        # counts capped at 255, summed over i >= min_cnt
        h = self.table.hist(max_cnt=255)
        idx = np.arange(256)
        sel = idx >= self.min_cnt
        sum_k = int(h[sel].sum())
        tot_k = int((idx[sel] * h[sel]).sum())
        self.kcov = float(tot_k) / sum_k if sum_k else 0.0
        raw = int(BFC_EC_MIN_COV_COEF * self.kcov + 0.499)
        self.min_cov = max(self.min_cnt, min(raw, self.max_cnt))
        reads, lens = self._encode_batch()
        kh, kl, cnt = self._dev
        # cheap pre-scan: only reads with at least one weak window go
        # through the (expensive) walk — at low error rates that is
        # about half the batch
        from ..ops.kmer import weak_reads_device
        weak = np.asarray(weak_reads_device(
            jnp.asarray(reads), jnp.asarray(lens), kh, kl, cnt,
            k, self.min_cov))
        idx = np.flatnonzero(weak[:len(self.m_seqs)])
        if idx.size == 0:
            return
        Bp = 64
        while Bp < idx.size and Bp < 4096:
            Bp *= 2
        if idx.size > Bp:
            Bp = (idx.size + 4095) // 4096 * 4096
        sub = np.full((Bp, reads.shape[1]), 4, np.uint8)
        sl = np.zeros(Bp, np.int64)
        sub[:idx.size] = reads[idx]
        sl[:idx.size] = lens[idx]
        corr, nchg = correct_reads_device(
            jnp.asarray(sub), jnp.asarray(sl), kh, kl, cnt,
            k, self.min_cov)
        corr = np.asarray(corr)
        nchg = np.asarray(nchg)
        for q in np.flatnonzero(nchg[:idx.size] > 0):
            i = int(idx[q])
            self.m_seqs[i] = decode_nt4(corr[q, :int(sl[q])])

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
