"""Seed chaining (host-side numpy; mem_chain equivalent).

Re-design of bwa-mem's B-tree chaining consumed by the reference via
``mem_align1`` (/root/reference/src/BWAAligner.cpp:104-109): seed
occurrences (qbeg, qend, text position in 2L space) are grouped into
colinear chains; chains are scored by query coverage (weight) and
filtered by drop_ratio.  Counts here are tiny (a handful of seeds per
read), so this stays on host; the DP extension that dominates runtime
is on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Chain:
    """A colinear group of seed occurrences (all in 2L text space)."""
    qbeg: int
    qend: int
    rbeg: int
    rend: int
    seeds: list[tuple[int, int, int]] = field(default_factory=list)
    # each seed: (qbeg, len, rbeg)

    @property
    def weight(self) -> int:
        """Query coverage by seeds (approximation of mem_chain_weight)."""
        ivs = sorted((q, q + l) for q, l, _ in self.seeds)
        tot, last = 0, -1
        for s, e in ivs:
            s = max(s, last)
            if e > s:
                tot += e - s
                last = e
        return tot

    @property
    def anchor(self) -> tuple[int, int, int]:
        """Longest seed (ties: leftmost)."""
        return max(self.seeds, key=lambda s: (s[1], -s[0]))


def chain_seeds(occs: list[tuple[int, int, int]], l_pac: int,
                max_chain_gap: int = 10000, band: int = 100
                ) -> list[Chain]:
    """Group seed occurrences into chains.

    occs: (qbeg, qend, rbeg) in 2L space.  A seed joins a chain when it
    is colinear: starts after the chain's last seed in both query and
    text, gap below max_chain_gap, and diagonal drift within band.
    Seeds never cross the forward/reverse midpoint (callers guarantee
    occurrences don't; windows are clamped later).
    """
    if not occs:
        return []
    # sort by text position
    occs = sorted(occs, key=lambda s: (s[2], s[0]))
    chains: list[Chain] = []
    for qb, qe, rb in occs:
        slen = qe - qb
        placed = False
        for ch in chains:
            if (rb >= l_pac) != (ch.rbeg >= l_pac):
                continue
            # colinearity with the chain's frontier
            dq = qb - (ch.qend)
            dr = rb - ch.rend
            diag_new = rb - qb
            diag_old = ch.rend - ch.qend
            if (qb >= ch.qbeg and rb >= ch.rbeg
                    and dr - dq <= band and dq - dr <= band
                    and dr < max_chain_gap and dq < max_chain_gap
                    and (dq > -slen)):  # allow overlap but monotone
                ch.seeds.append((qb, slen, rb))
                ch.qend = max(ch.qend, qe)
                ch.rend = max(ch.rend, rb + slen)
                placed = True
                break
        if not placed:
            chains.append(Chain(qb, qe, rb, rb + slen, [(qb, slen, rb)]))
    return chains


def filter_chains(chains: list[Chain], drop_ratio: float = 0.5,
                  min_weight: int = 0, max_keep: int = 8) -> list[Chain]:
    """mem_chain_flt-style filtering: keep chains whose weight is at
    least drop_ratio * best weight, capped at max_keep."""
    if not chains:
        return []
    chains = sorted(chains, key=lambda c: -c.weight)
    best = chains[0].weight
    kept = [c for c in chains
            if c.weight >= drop_ratio * best and c.weight >= min_weight]
    return kept[:max_keep]
