"""String-graph (overlap) assembly into unitigs.

TPU-native rebuild of the reference's FermiAssembler wrapper over
fermi-lite (/root/reference/src/FermiAssembler.cpp,
/root/reference/SeqLib/FermiAssembler.h): reads -> error correction
(BFC) -> suffix/prefix overlap detection (sort-join on seed hashes) ->
best-overlap string graph -> non-branching path merge -> unitigs with
per-base coverage + GFA 1.0 export.

The vendored fermi-lite is absent from the snapshot (empty submodule —
SURVEY.md §0.1); behavioral contract = reconstruct the source region
from reads (tests/test_assembly.py) and honor the option setters
(min overlap, aggressive trim, drop ratio, k-mer thresholds,
FermiAssembler.h:78-103).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.seq import revcomp
from ..core.unaligned import UnalignedSequence
from .bfc import BFC


@dataclass
class AssemblyOptions:
    """fml_opt_t analog (defaults mirror fml_opt_init)."""
    min_asm_ovlp: int = 33
    min_merge_len: int = 0
    ec_k: int = 0               # 0 = auto
    min_cnt: int = 4
    max_cnt: int = 8
    n_threads: int = 1
    # mag_opt
    aggressive: bool = False
    simplify_bubble: bool = True
    min_dratio1: float = 0.7
    min_elen: int = 300


@dataclass
class Unitig:
    """fml_utg_t analog."""
    seq: str
    nsr: int                    # number of supporting reads
    cov: str                    # per-base coverage, ASCII 33-based
    links: list[tuple[int, str, int, str, int]] = field(
        default_factory=list)   # (from, fromo, to, too, ovlp)


class FermiAssembler:
    """API parity: /root/reference/SeqLib/FermiAssembler.h:20-149."""

    def __init__(self, opt: AssemblyOptions | None = None):
        self.opt = opt or AssemblyOptions()
        self.m_seqs: list[str] = []
        self.m_quals: list[str] = []
        self.m_names: list[str] = []
        self.m_utgs: list[Unitig] = []

    # -- reads ----------------------------------------------------------

    def add_read(self, r) -> None:
        """UnalignedSequence or BamRecord
        (parity: AddRead FermiAssembler.cpp:41-87)."""
        if isinstance(r, UnalignedSequence):
            if not r.seq:
                raise ValueError("FermiAssembler: empty sequence")
            self.m_seqs.append(r.seq.upper())
            self.m_quals.append(r.qual)
            self.m_names.append(r.name)
        else:  # BamRecord
            self.m_seqs.append(r.seq.upper())
            self.m_quals.append(r.qualities())
            self.m_names.append(r.qname)

    def add_reads(self, rs) -> None:
        for r in rs:
            self.add_read(r)

    def num_sequences(self) -> int:
        return len(self.m_seqs)

    def clear_reads(self) -> None:
        self.m_seqs = []
        self.m_quals = []
        self.m_names = []

    def clear_contigs(self) -> None:
        self.m_utgs = []

    def get_sequences(self):
        return [UnalignedSequence(n, s, q) for n, s, q in
                zip(self.m_names, self.m_seqs, self.m_quals)]

    # -- option setters (FermiAssembler.h:78-103) ------------------------

    def set_min_overlap(self, m: int) -> None:
        self.opt.min_asm_ovlp = int(m)

    def get_min_overlap(self) -> int:
        return self.opt.min_asm_ovlp

    def set_aggressive_trim(self) -> None:
        self.opt.aggressive = True

    def set_simplify_bubble(self) -> None:
        self.opt.simplify_bubble = True

    def set_drop_overlap_ratio(self, ratio: float) -> None:
        self.opt.min_dratio1 = ratio

    def set_kmer_min_threshold(self, v: int) -> None:
        self.opt.min_cnt = v

    def set_kmer_max_threshold(self, v: int) -> None:
        self.opt.max_cnt = v

    # -- correction ------------------------------------------------------

    def correct_reads(self) -> None:
        """(parity: CorrectReads -> fml_correct)"""
        bfc = BFC()
        if self.opt.ec_k:
            bfc.set_kmer(self.opt.ec_k)
        for s, q, n in zip(self.m_seqs, self.m_quals, self.m_names):
            bfc.add_sequence(s, q, n)
        bfc.train()
        bfc.error_correct()
        self.m_seqs = list(bfc.m_seqs)

    def correct_and_filter_reads(self) -> None:
        """(parity: CorrectAndFilterReads -> fml_fltuniq): correct, then
        drop reads containing k-mers seen only once."""
        self.correct_reads()
        bfc = BFC()
        for s in self.m_seqs:
            bfc.add_sequence(s)
        bfc.train()
        from .bfc import canonical_kmers
        from ..core.seq import encode_nt4
        k = bfc.kmer
        keep = []
        for i, s in enumerate(self.m_seqs):
            if len(s) < k:
                continue
            cnt = bfc.table.lookup(canonical_kmers(encode_nt4(s), k))
            if (cnt >= 2).all():
                keep.append(i)
        self.m_seqs = [self.m_seqs[i] for i in keep]
        self.m_quals = [self.m_quals[i] for i in keep]
        self.m_names = [self.m_names[i] for i in keep]

    # -- assembly --------------------------------------------------------

    def perform_assembly(self) -> None:
        """(parity: PerformAssembly -> fml_assemble)"""
        self.m_utgs = self._assemble(self.m_seqs)

    def direct_assemble(self, kcov: float = 0.0) -> None:
        """Assembly without correction (parity: DirectAssemble
        FermiAssembler.cpp:24-39; kcov drives fermi's min_ensr
        heuristic — here it scales the min supporting-read count)."""
        old = self.opt.min_cnt
        if kcov > 0:
            self.opt.min_cnt = max(2, int(kcov * 0.1))
        self.m_utgs = self._assemble(self.m_seqs)
        self.opt.min_cnt = old

    def get_contigs(self) -> list[str]:
        return [u.seq for u in self.m_utgs]

    def get_unitigs(self) -> list[Unitig]:
        return self.m_utgs

    # -- core overlap assembler -----------------------------------------

    def _assemble(self, seqs: list[str], flt_uniq: bool = True
                  ) -> list[Unitig]:
        min_ovlp = self.opt.min_asm_ovlp
        if self.opt.aggressive:
            min_ovlp = max(min_ovlp, min_ovlp + 10)
        # fermi-lite's fml_assemble filters reads carrying singleton
        # k-mers before graph construction (error reads make bubbles);
        # same here with the BFC table
        if flt_uniq and len(seqs) > 50:
            from .bfc import KmerTable, canonical_kmers, auto_kmer
            from ..core.seq import encode_nt4
            total = sum(len(s) for s in seqs)
            k = self.opt.ec_k or auto_kmer(total)
            chunks = [canonical_kmers(encode_nt4(s), k) for s in seqs
                      if len(s) >= k]
            table = KmerTable(np.concatenate(chunks)) if chunks else None
            if table is not None and table.keys.size:
                kept = []
                thr = max(2, min(3, self.opt.min_cnt - 1))
                for s in seqs:
                    if len(s) < k:
                        continue
                    cnt = table.lookup(canonical_kmers(encode_nt4(s), k))
                    if (cnt >= thr).all():
                        kept.append(s)
                if len(kept) >= 0.5 * len(seqs):
                    seqs = kept
        # 1) dedup with multiplicity, both orientations
        counts: dict[str, int] = {}
        for s in seqs:
            if len(s) >= min_ovlp + 1 and "N" not in s:
                counts[s] = counts.get(s, 0) + 1
        # drop contained reads (substring of another read)
        uniq = sorted(counts, key=len, reverse=True)
        kept: list[str] = []
        seen_sub: set[str] = set()
        # cheap containment filter via 2-sided anchors
        big = set(uniq)
        oriented: list[str] = []
        mult: list[int] = []
        for s in uniq:
            oriented.append(s)
            mult.append(counts[s])
        # add reverse complements as their own oriented nodes
        n_fwd = len(oriented)
        for i in range(n_fwd):
            oriented.append(revcomp(oriented[i]))
            mult.append(mult[i])
        N = len(oriented)
        if N == 0:
            return []

        # 2) overlap detection: index SEED-length prefixes
        SEED = min(min_ovlp, 32)
        pref: dict[str, list[int]] = {}
        for j, s in enumerate(oriented):
            pref.setdefault(s[:SEED], []).append(j)

        MAXC = 4
        cand_succ: list[list[tuple[int, int]]] = [[] for _ in range(N)]
        for i, s in enumerate(oriented):
            L = len(s)
            # up to MAXC longest proper suffix-prefix overlaps,
            # scanning p ascending (longest first)
            for p in range(1, L - min_ovlp + 1):
                key = s[p:p + SEED]
                for j in pref.get(key, ()):
                    if j == i:
                        continue
                    t = oriented[j]
                    olen = L - p
                    if olen < len(t) and t[:olen] == s[p:]:
                        cand_succ[i].append((j, olen))
                        break
                if len(cand_succ[i]) >= MAXC:
                    break
        # drop-ratio pruning
        for i, cands in enumerate(cand_succ):
            if cands:
                mx = cands[0][1]
                cand_succ[i] = [(j, o) for j, o in cands
                                if o >= self.opt.min_dratio1 * mx]
        # best predecessor over ALL candidate edges
        best_pred = [-1] * N
        best_pred_len = [0] * N
        for i in range(N):
            for j, o in cand_succ[i]:
                if o > best_pred_len[j]:
                    best_pred[j] = i
                    best_pred_len[j] = o
        # successor = longest candidate whose best pred is us
        best_succ = [-1] * N
        best_succ_len = [0] * N
        for i in range(N):
            for j, o in cand_succ[i]:
                if best_pred[j] == i:
                    best_succ[i] = j
                    best_succ_len[i] = o
                    break

        def rc_id(i: int) -> int:
            return i + n_fwd if i < n_fwd else i - n_fwd

        # 3) walk maximal chains (reciprocal links only)
        used = [False] * N
        unitigs: list[Unitig] = []
        for start in range(N):
            if used[start]:
                continue
            # rewind to chain head
            head = start
            guard = 0
            while True:
                p = best_pred[head]
                if p < 0 or best_succ[p] != head or used[p]:
                    break
                head = p
                guard += 1
                if head == start or guard > N:
                    break  # cycle
            # walk forward
            chain = [head]
            used[head] = True
            used_rc = {rc_id(head)}
            node = head
            while True:
                nxt = best_succ[node]
                if nxt < 0 or best_pred[nxt] != node or used[nxt] \
                        or nxt in used_rc:
                    break
                chain.append(nxt)
                used[nxt] = True
                used_rc.add(rc_id(nxt))
                node = nxt
            # build sequence + coverage
            seq = oriented[chain[0]]
            cov = np.zeros(len(seq), dtype=np.int32)
            cov[:] += mult[chain[0]]
            nsr = mult[chain[0]]
            offset = 0
            for a, b in zip(chain, chain[1:]):
                o = best_succ_len[a]
                t = oriented[b]
                offset = len(seq) - o
                seq = seq[:offset] + t
                grown = np.zeros(len(seq), dtype=np.int32)
                grown[:cov.size] = cov
                grown[offset:offset + len(t)] += mult[b]
                cov = grown
                nsr += mult[b]
            # mark rc of all chain members used so each unitig emits once
            for c in chain:
                used[rc_id(c)] = True
            unitigs.append(Unitig(
                seq=seq, nsr=nsr,
                cov="".join(chr(min(int(c), 92) + 33) for c in cov)))
        # 4) filter: minimum support / length heuristics
        out = [u for u in unitigs
               if u.nsr >= 2 or len(u.seq) >= self.opt.min_elen]
        # canonical dedup (a unitig and its revcomp)
        seen: set[str] = set()
        final = []
        for u in out:
            key = min(u.seq, revcomp(u.seq))
            if key in seen:
                continue
            seen.add(key)
            final.append(u)
        # 5) drop contained unitigs (tips absorbed by larger paths)
        final.sort(key=lambda u: -len(u.seq))
        kept_out: list[Unitig] = []
        for u in final:
            rc = revcomp(u.seq)
            contained = any(u.seq in big.seq or rc in big.seq
                            for big in kept_out)
            if not contained:
                kept_out.append(u)
        return kept_out

    # -- GFA export (parity: WriteGFA FermiAssembler.cpp:186-205) --------

    def write_gfa(self, out) -> None:
        out.write("H\tVN:Z:1.0\n")
        for i, u in enumerate(self.m_utgs):
            out.write(f"S\tutg{i + 1}\t{u.seq}\tLN:i:{len(u.seq)}\t"
                      f"KC:i:{u.nsr}\n")
        # detect overlaps between unitig ends for L lines
        mo = self.opt.min_asm_ovlp
        for i, a in enumerate(self.m_utgs):
            for j, b in enumerate(self.m_utgs):
                if i == j:
                    continue
                for olen in range(min(len(a.seq), len(b.seq)) - 1, mo - 1,
                                  -1):
                    if a.seq[-olen:] == b.seq[:olen]:
                        out.write(f"L\tutg{i + 1}\t+\tutg{j + 1}\t+\t"
                                  f"{olen}M\n")
                        break

    # reference-style aliases
    AddRead = add_read
    AddReads = add_reads
    ClearReads = clear_reads
    ClearContigs = clear_contigs
    CorrectReads = correct_reads
    CorrectAndFilterReads = correct_and_filter_reads
    PerformAssembly = perform_assembly
    DirectAssemble = direct_assemble
    GetContigs = get_contigs
    GetSequences = get_sequences
    NumSequences = num_sequences
    SetMinOverlap = set_min_overlap
    GetMinOverlap = get_min_overlap
    SetAggressiveTrim = set_aggressive_trim
    SetSimplifyBubble = set_simplify_bubble
    SetDropOverlapRatio = set_drop_overlap_ratio
    SetKmerMinThreshold = set_kmer_min_threshold
    SetKmerMaxThreshold = set_kmer_max_threshold
    WriteGFA = write_gfa
